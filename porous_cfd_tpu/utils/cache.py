"""Persistent XLA compilation cache (jax_compilation_cache_dir): every CLI
entry point enables it so repeated pipeline invocations (the staged launcher,
tools/train_golden_duct.py's train->evaluate subprocess chain, the bench)
skip recompilation of unchanged programs. Safe to call multiple times and on
backends without cache support (config set is a no-op until first compile)."""
from __future__ import annotations

import os

DEFAULT_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), ".jax_cache")


def enable_persistent_cache(cache_dir: str | None = None) -> None:
    import jax

    if cache_dir is None and jax.config.jax_compilation_cache_dir:
        return  # respect a consumer-configured cache location
    jax.config.update("jax_compilation_cache_dir",
                      cache_dir or os.environ.get("JAX_CACHE_DIR",
                                                  DEFAULT_DIR))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
