"""Inference pipeline (reference ``common/inference.py``): per-case prediction
with a result-processing callback for plotting, plots saved under
``<checkpoint_parent>/plots/<split>/<case>``.
"""
from __future__ import annotations

import argparse
import os
from argparse import ArgumentParser, Namespace
from pathlib import Path
from typing import Callable

import jax.numpy as jnp
import matplotlib

from porous_cfd_tpu.data.dataset import FoamDataset
from porous_cfd_tpu.data.foam_data import FoamData
from porous_cfd_tpu.models.base import PinnModel
from porous_cfd_tpu.train.engine import (gather_cases, make_optimizer,
                                         make_train_functions)
from porous_cfd_tpu.utils.cache import enable_persistent_cache


def default_checkpoint() -> str:
    """Last run in lightning_logs, alphabetical (inference.py:23-26)."""
    try:
        last = sorted(os.listdir("lightning_logs"))[-1]
        return str(Path("lightning_logs") / last / "model.ckpt")
    except (FileNotFoundError, IndexError):
        return "model.ckpt"


def build_arg_parser() -> ArgumentParser:
    """Reference CLI (inference.py:19-39)."""
    p = argparse.ArgumentParser()
    p.add_argument("--save-plots", action="store_true", default=False,
                   help="save all the inference plots")
    p.add_argument("--checkpoint", type=str, default=default_checkpoint(),
                   help="path of the saved model checkpoint")
    p.add_argument("--data-dir", type=str, default="data/test")
    p.add_argument("--meta-dir", type=str, default="data/train",
                   help="directory containing the meta.json file")
    p.add_argument("--n-internal", type=int, default=1000)
    p.add_argument("--n-boundary", type=int, default=200)
    p.add_argument("--n-observations", type=int, default=500)
    p.add_argument("--precision", type=str, default="bf16-mixed")
    return p


def create_plots_root(args: Namespace) -> Path | None:
    if not args.save_plots:
        return None
    path = Path(args.checkpoint).parent / "plots" / Path(args.data_dir).name
    path.mkdir(exist_ok=True, parents=True)
    return path


def create_case_plot_dir(plots_root: Path | None, case_name: str):
    if plots_root is None:
        return None
    d = plots_root / case_name
    d.mkdir(exist_ok=True, parents=True)
    return d


ResultFn = Callable[[FoamDataset, FoamData, FoamData, Path, Path | None], None]


def predict(args: Namespace, model: PinnModel, params, data: FoamDataset,
            result_process_fn: ResultFn) -> list[FoamData]:
    """Predict each case (batch of 1, like the reference DataLoader,
    inference.py:64-93) and invoke the plotting callback."""
    import jax

    enable_persistent_cache()

    # honor --precision on this forward-only path (bf16 compute, f32 params)
    model = model.with_precision(getattr(args, "precision", "32-true"))
    tx = make_optimizer(model, 1)
    fns = make_train_functions(model, tx)
    stacked = jax.device_put(model.attach_neighbors(data.stacked()))

    if args.save_plots:
        default_backend = matplotlib.get_backend()
        matplotlib.use("Agg")
    plots_root = create_plots_root(args)

    predictions = []
    for i in range(len(data)):
        batch = gather_cases(stacked, jnp.asarray([i]))
        predicted = fns.predict_batch(params, batch, False).numpy().squeeze()
        predictions.append(predicted)
        case_path = Path(data.samples[i])
        case_plot_dir = create_case_plot_dir(plots_root, case_path.name)
        result_process_fn(data, data[i], predicted, case_path, case_plot_dir)

    if args.save_plots:
        matplotlib.use(default_backend)
    return predictions
