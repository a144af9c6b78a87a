"""Pallas TPU kernel for farthest-point sampling.

FPS is inherently sequential (each centroid depends on the running
min-distance field), so both the XLA version (models/neighbors.py) and a
naive per-cloud kernel are latency-bound: ~500 dependent argmax iterations.
This kernel recovers throughput by processing the WHOLE BATCH of clouds in
one kernel invocation — the (B, N) distance fields live on the sublane x lane
grid, each iteration does per-row (cross-lane) argmax + masked gather for all
B clouds simultaneously, and coordinates stay VMEM-resident throughout.

Layout notes (see the Pallas TPU guide): coordinates arrive transposed as
(D, B, N) so the point axis rides the 128-wide lanes and the batch rides
sublanes; dynamic per-row gathers are expressed as masked lane reductions
(Mosaic cannot lower dynamic_slice on values / unaligned dynamic stores).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fps_kernel(n_samples: int, pos_ref, out_ref):
    """pos_ref: (D, B, N) f32 in VMEM; out_ref: (B, C) int32."""
    d_dims, b, n = pos_ref.shape

    lane = jax.lax.broadcasted_iota(jnp.int32, (b, n), 1)
    out_lane = jax.lax.broadcasted_iota(jnp.int32, (b, n_samples), 1)

    def dist_to(sel):
        """Squared distance of every point to each cloud's point sel (B, 1)."""
        sel_mask = (lane == sel).astype(jnp.float32)
        acc = jnp.zeros((b, n), jnp.float32)
        for d in range(d_dims):  # D is 2 or 3 — static unroll
            rows = pos_ref[d]                                # (B, N)
            sel_val = jnp.sum(rows * sel_mask, axis=1, keepdims=True)
            acc = acc + (rows - sel_val) ** 2
        return acc

    def body(i, carry):
        min_d2, last, out_vec = carry
        min_d2 = jnp.minimum(min_d2, dist_to(last))
        nxt = jnp.argmax(min_d2, axis=1, keepdims=True).astype(jnp.int32)
        out_vec = jnp.where(out_lane == i, nxt, out_vec)
        return min_d2, nxt, out_vec

    init = (jnp.full((b, n), jnp.finfo(jnp.float32).max, jnp.float32),
            jnp.zeros((b, 1), jnp.int32),
            jnp.zeros((b, n_samples), jnp.int32))
    _, _, out_vec = jax.lax.fori_loop(1, n_samples, body, init)
    out_ref[:] = out_vec


@partial(jax.jit, static_argnums=(1, 2))
def farthest_point_sampling_pallas(pos: jnp.ndarray, n_samples: int,
                                   interpret: bool = False) -> jnp.ndarray:
    """FPS over pos (N, D) or (B, N, D) -> (..., n_samples) int32 indices,
    starting at point 0 (same contract as
    models.neighbors.farthest_point_sampling).

    :param interpret: run in the Pallas interpreter (for CPU tests).
    """
    squeeze = pos.ndim == 2
    if squeeze:
        pos = pos[None]
    if pos.ndim > 3:  # extra leading axes -> flatten into batch
        lead = pos.shape[:-2]
        out = farthest_point_sampling_pallas(
            pos.reshape(-1, *pos.shape[-2:]), n_samples, interpret)
        return out.reshape(*lead, n_samples)

    pos_t = jnp.transpose(pos, (2, 0, 1)).astype(jnp.float32)  # (D, B, N)
    out = pl.pallas_call(
        partial(_fps_kernel, n_samples),
        out_shape=jax.ShapeDtypeStruct((pos.shape[0], n_samples), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(pos_t)
    return out[0] if squeeze else out


def use_pallas_fps() -> bool:
    """Pallas path is available on real TPU backends."""
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover
        return False
