"""Evaluation pipeline (reference ``common/evaluation.py``): verbose prediction
with PDE residual fields, error statistics + plots + ``Errors.csv``, PINN vs
OpenFOAM timing comparison, extensible per-batch/post hooks.
"""
from __future__ import annotations

import argparse
import time
from argparse import ArgumentParser, Namespace
from pathlib import Path
from typing import Any, Callable

import jax.numpy as jnp
import matplotlib
import numpy as np
from pandas import DataFrame

from porous_cfd_tpu.data.dataset import FoamDataset
from porous_cfd_tpu.data.foam_data import FoamData
from porous_cfd_tpu.models.base import PinnModel
from porous_cfd_tpu.pipelines.inference import default_checkpoint
from porous_cfd_tpu.utils import profiling
from porous_cfd_tpu.train.engine import (gather_cases, make_optimizer,
                                         make_train_functions)
from porous_cfd_tpu.viz.common import (box_plot, plot_data_dist, plot_errors,
                                       plot_multi_bar, plot_per_case,
                                       plot_timing)
from porous_cfd_tpu.utils.cache import enable_persistent_cache


def create_plots_root_dir(save_plots: bool, data_dir: str, checkpoint: str):
    """<checkpoint_parent>/plots/<split>/stats (evaluation.py:23-32)."""
    if not save_plots:
        return None
    matplotlib.use("Agg")
    path = Path(checkpoint).parent / "plots" / Path(data_dir).name / "stats"
    path.mkdir(exist_ok=True, parents=True)
    return path


# -- stat helpers (evaluation.py:35-109) --------------------------------------

def extract_coef(coef: np.ndarray, scaler) -> np.ndarray:
    """Max denormalized coefficient per case; coef (B,N,D) -> (B,1,1)."""
    coef = np.asarray(scaler.inverse_transform(coef))[..., 0:1]
    return np.max(coef, axis=-2, keepdims=True)


def extract_u_magnitude(u: np.ndarray, scaler, spacing) -> np.ndarray:
    """Inlet speed per case, snapped to the given spacing."""
    u_mag = np.linalg.norm(np.asarray(scaler.inverse_transform(u)), axis=-1,
                           keepdims=True)
    u_mag = np.max(u_mag, axis=-2, keepdims=True)
    return np.round(u_mag / spacing) * spacing


def extract_angle(u: np.ndarray, scaler) -> np.ndarray:
    """Signed inlet angle in degrees per case."""
    u = np.asarray(scaler.inverse_transform(u))
    u_mag = np.linalg.norm(u, axis=-1, keepdims=True)
    a = np.arccos(u[..., 0:1] / u_mag)
    a = np.max(a, axis=-2, keepdims=True)
    a = a * np.max(np.sign(u[..., -1:]), axis=-2, keepdims=True)
    return np.rad2deg(a)


def get_normalized_signed_distance(points: np.ndarray, target: np.ndarray
                                   ) -> np.ndarray:
    """Min distance of each point from the target cloud, max-normalized."""
    d = np.linalg.norm(points[..., :, None, :] - target[..., None, :, :],
                       axis=-1)
    d = np.min(d, axis=-1)[..., None]
    return d / np.max(d)


def get_mean_max_error_distance(errors: np.ndarray, quantile: float,
                                interface_dist: np.ndarray) -> np.ndarray:
    """Mean interface distance of top-quantile errors, averaged over cases
    (evaluation.py:87-105)."""
    q_mask = errors > np.quantile(errors, quantile, axis=-2, keepdims=True)
    per_case = []
    for mask, dist in zip(q_mask, interface_dist):
        dims = np.split(mask, errors.shape[-1], axis=-1)
        per_case.append(np.array(
            [np.mean(dist[m.flatten()]) for m in dims]))
    return np.mean(np.stack(per_case), axis=0)


def get_pressure_drop(inlet_p, outlet_p):
    return np.mean(inlet_p) - np.mean(outlet_p)


def build_arg_parser() -> ArgumentParser:
    """Reference CLI (evaluation.py:112-133)."""
    p = argparse.ArgumentParser()
    p.add_argument("--save-plots", action="store_true", default=False)
    p.add_argument("--checkpoint", type=str, default=default_checkpoint())
    p.add_argument("--data-dir", type=str, default="data/test")
    p.add_argument("--meta-dir", type=str, default="data/train")
    p.add_argument("--n-internal", type=int, default=1000)
    p.add_argument("--n-boundary", type=int, default=200)
    p.add_argument("--n-observations", type=int, default=500)
    p.add_argument("--precision", type=str, default="bf16-mixed")
    p.add_argument("--batch-size", type=int, default=4)
    return p


def get_common_data(data: FoamDataset, predicted: FoamData, target: FoamData,
                    extras: FoamData) -> dict[str, Any]:
    """Per-batch error/residual extraction (evaluation.py:136-179)."""
    predicted_u, predicted_p = np.asarray(predicted["U"]), np.asarray(predicted["p"])
    target_u, target_p = np.asarray(target["U"]), np.asarray(target["p"])
    if "U" in data.normalizers:
        predicted_u = np.asarray(data.normalizers["U"].inverse_transform(predicted_u))
        target_u = np.asarray(data.normalizers["U"].inverse_transform(target_u))
    if "p" in data.normalizers:
        predicted_p = np.asarray(data.normalizers["p"].inverse_transform(predicted_p))
        target_p = np.asarray(data.normalizers["p"].inverse_transform(target_p))

    u_error = np.abs(predicted_u - target_u)
    p_error = np.abs(predicted_p - target_p)

    predicted_div = np.asarray(extras["div"])
    predicted_momentum = np.asarray(extras["Momentum"])
    target_div = np.zeros_like(predicted_div)
    target_momentum = np.zeros_like(predicted_momentum)
    if "momentError" in target and "div(phi)" in target:
        target_div = np.asarray(target["internal"]["div(phi)"])
        target_momentum = np.asarray(target["internal"]["momentError"])

    # cases without an explicit fluid/porous interface patch (e.g. the FVM
    # golden-duct fixtures) skip the distance-from-interface metrics
    if "interface" in target.domain:
        all_points = np.asarray(target["C"])
        interface_points = np.asarray(target["interface"]["C"])
        if "C" in data.normalizers:
            all_points = np.asarray(
                data.normalizers["C"].inverse_transform(all_points))
            interface_points = np.asarray(
                data.normalizers["C"].inverse_transform(interface_points))
        interface_dist = get_normalized_signed_distance(all_points,
                                                        interface_points)
    else:
        interface_dist = None

    return {"U error": u_error,
            "p error": p_error,
            "Predicted momentum": predicted_momentum,
            "Predicted divergence": predicted_div,
            "Target momentum": target_momentum,
            "Target divergence": target_div,
            "Region id": np.asarray(target["cellToRegion"]),
            "Interface distance": interface_dist}


def plot_common_data(data: dict, plots_path) -> DataFrame:
    """Aggregate plots + Errors.csv (evaluation.py:182-257)."""
    errors = np.concatenate([data["U error"], data["p error"]], axis=-1)
    n_dims = errors.shape[-1] - 1
    labels = ["$U_x$", "$U_y$", "$U_z$"][:n_dims] + ["$p$"]
    eval_df = DataFrame(columns=labels)

    max_per_case = np.max(errors, axis=1)
    box_plot("Maximum errors per case", [*np.hsplit(max_per_case, n_dims + 1)],
             labels, plots_path)
    plot_per_case("Per case max errors", max_per_case, plots_path)
    eval_df.loc["Average max errors"] = np.mean(max_per_case, axis=0)

    quantiles = np.quantile(errors, 0.8, axis=-2, keepdims=True)
    top_errors = []
    for q, e in zip(quantiles, errors):
        keep = np.transpose(e > q)
        per_field = [f[k] for f, k in zip(np.transpose(e), keep)]
        top_errors.append(np.array([np.mean(ce, axis=-1) for ce in per_field]))
    top_errors = np.mean(np.array(top_errors), axis=0).tolist()
    plot_errors("Top 20% mean errors", top_errors, save_path=plots_path)
    eval_df.loc["Top 20"] = top_errors

    plot_per_case("Per case mean errors", np.mean(errors, axis=-2), plots_path)

    if data["Interface distance"] is not None:
        max_err_dist = get_mean_max_error_distance(errors, 0.8,
                                                   data["Interface distance"])
        plot_errors("Errors mean normalized distance from interface",
                    max_err_dist, save_path=plots_path)
        eval_df.loc["Top errors distance from interface"] = max_err_dist

    u_errors = np.concatenate(data["U error"])
    p_errors = np.concatenate(data["p error"])
    plot_data_dist("Absolute error distribution", u_errors, p_errors,
                   save_path=plots_path)

    flat = np.concatenate([u_errors, p_errors], -1)
    mae = np.mean(flat, axis=0).tolist()
    plot_errors("Average relative error", mae, save_path=plots_path)
    eval_df.loc["MAE"] = mae

    zones = data["Region id"].flatten()
    fluid_mae = np.mean(flat[zones < 1, :], axis=0).tolist()
    plot_errors("Fluid region MAE", fluid_mae, save_path=plots_path)
    eval_df.loc["Fluid MAE"] = fluid_mae
    porous_mae = np.mean(flat[zones > 0, :], axis=0).tolist()
    plot_errors("Porous region MAE", porous_mae, save_path=plots_path)
    eval_df.loc["Porous MAE"] = porous_mae

    predicted_div = np.concatenate(data["Predicted divergence"])
    predicted_momentum = np.concatenate(data["Predicted momentum"])
    plot_data_dist("Absolute residuals", np.abs(predicted_momentum),
                   np.abs(predicted_div), save_path=plots_path)

    target_momentum = np.concatenate(data["Target momentum"])
    target_div = np.concatenate(data["Target divergence"])
    target_res = np.concatenate([target_momentum, target_div], axis=-1)
    predicted_res = np.concatenate([predicted_momentum, predicted_div], axis=-1)
    pred_avg = np.mean(np.abs(predicted_res), axis=0)
    cfd_avg = np.mean(np.abs(target_res), axis=0)
    plot_multi_bar("Absolute average residuals",
                   {"Predicted": pred_avg.tolist(), "Target": cfd_avg.tolist()},
                   ["Momentum x", "Momentum y", "Momentum z"][:n_dims]
                   + ["Continuity"], save_path=plots_path)
    eval_df.loc["Residuals"] = pred_avg

    if plots_path:
        eval_df.to_csv(f"{plots_path}/Errors.csv")
    else:
        print(eval_df)
    return eval_df


SampleFn = Callable[[FoamDataset, FoamData, FoamData, FoamData], dict]
PostFn = Callable[[FoamDataset, dict, Path], None]


def evaluate(args: Namespace, model: PinnModel, params, data: FoamDataset,
             enable_timing: bool = False,
             sample_process_fn: SampleFn | None = None,
             postprocess_fn: PostFn | None = None) -> dict:
    """Evaluation loop (evaluation.py:260-328): verbose prediction (residual
    fields), wall-clock timing vs OpenFOAM meta, per-batch extraction,
    aggregate plots + CSVs and custom hooks."""
    enable_persistent_cache()
    plots_path = create_plots_root_dir(args.save_plots, data.data_dir,
                                       args.checkpoint)
    import jax

    tx = make_optimizer(model, 1)
    fns = make_train_functions(model, tx)
    stacked = jax.device_put(model.attach_neighbors(data.stacked()))

    n, b = len(data), args.batch_size
    batches = [jnp.arange(s, min(s + b, n)) for s in range(0, n, b)]

    start = time.perf_counter()
    predictions = [fns.predict_batch(params, gather_cases(stacked, idx), True)
                   for idx in batches]
    # device->host sync: block_until_ready returns early on tunneled backends
    # (axon), which would turn this timing into a dispatch rate (BASELINE.md).
    profiling.sync(predictions)
    inference_time = time.perf_counter() - start
    avg_inference_time = inference_time / n

    if args.save_plots:
        default_backend = matplotlib.get_backend()
        matplotlib.use("Agg")

    if enable_timing:
        cfd = data.meta["Timing"]
        plot_timing([inference_time, cfd["Total"] / 1e3],
                    [avg_inference_time, cfd["Average"] / 1e3], plots_path)

    results: dict | None = None
    for idx, (pde, extras) in zip(batches, predictions):
        target = gather_cases(stacked, idx)
        sample = get_common_data(data, pde.numpy(), target.numpy(),
                                 extras.numpy())
        if sample_process_fn:
            sample.update(sample_process_fn(data, pde, target, extras))
        if results is None:
            results = {k: [] for k in sample}
        for k, v in sample.items():
            if v is not None:
                results[k].append(np.asarray(v))

    results = {k: np.concatenate(v) if v else None
               for k, v in results.items()}
    plot_common_data(results, plots_path)
    if postprocess_fn:
        postprocess_fn(data, results, plots_path)
    if args.save_plots:
        matplotlib.use(default_backend)
    return results
