"""Decompose held-out pressure error into (gauge offset) + (field shape).

Pressure in incompressible NS is only defined up to an additive constant; the
duct cases pin the gauge with the outlet Dirichlet p = 0. If a trained model's
held-out p error is dominated by a per-case constant offset, then anchoring
the predicted field to the KNOWN outlet BC (part of the case specification,
not the solution) recovers most of the accuracy for free.

Reports, per split: raw rel-L2, rel-L2 after outlet-patch anchoring
(pred - mean(pred at outlet) + bc), and rel-L2 after oracle mean-offset
removal (lower bound for any constant-shift correction).

Usage: python tools/analyze_p_offset.py [--root data/golden_grid]
       [--name grid-pipn-analytic] [--example duct_fixed_boundary]
"""
import argparse
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def rel_l2(pred, ref):
    return float(np.linalg.norm(pred - ref) / np.linalg.norm(ref))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="data/golden_grid")
    ap.add_argument("--name", default="grid-pipn-analytic")
    ap.add_argument("--example", default="duct_fixed_boundary")
    ap.add_argument("--model", default="pipn")
    ap.add_argument("--n-internal", type=int, default=1500)
    ap.add_argument("--n-boundary", type=int, default=350)
    ap.add_argument("--n-obs", type=int, default=700)
    args = ap.parse_args()

    import importlib

    import jax.numpy as jnp

    train_mod = importlib.import_module(f"examples.{args.example}.train")
    from porous_cfd_tpu.data.dataset import FoamDataset
    from porous_cfd_tpu.train.engine import (gather_cases, make_optimizer,
                                             make_train_functions)
    from porous_cfd_tpu.train.trainer import load_checkpoint

    root = Path(args.root).resolve()
    ckpt = root / "logs" / "lightning_logs" / args.name / "model.ckpt"
    train_ds = FoamDataset(str(root / "train"), args.n_internal,
                           args.n_boundary, args.n_obs,
                           np.random.default_rng(8421))
    ns = argparse.Namespace(model=args.model, fast_derivatives=True)
    model = train_mod.get_model(ns, train_ds.normalizers)
    state, _ = load_checkpoint(str(ckpt), model, train_ds.stacked())
    fns = make_train_functions(model, make_optimizer(model, 1))
    p_s = train_ds.normalizers["p"]

    for split in ("train", "val", "test"):
        ds = FoamDataset(str(root / split), args.n_internal, args.n_boundary,
                         args.n_obs, np.random.default_rng(8421),
                         meta_dir=str(root / "train"))
        batch = gather_cases(ds.stacked(), jnp.arange(len(ds)))
        pred = fns.predict_batch(state.params, batch, False).numpy()
        p_pred = np.asarray(p_s.inverse_transform(pred["p"]))[..., 0]
        p_ref = np.asarray(p_s.inverse_transform(np.asarray(batch["p"])))[
            ..., 0]

        # outlet patch rows: boundary layout is per-patch contiguous, sorted
        # by patch name (FoamData invariant); find outlet rows from one case
        fd = ds.data[0]
        names = fd.boundary_names if hasattr(fd, "boundary_names") else None
        # fall back: locate outlet via sampled patch spans in the dataset
        spans = ds.patch_spans() if hasattr(ds, "patch_spans") else None
        print(f"[{split}] patches: names={names} spans={spans}")

        raw = rel_l2(p_pred.ravel(), p_ref.ravel())
        # oracle constant-offset removal (per case)
        off = (p_pred - p_ref).mean(axis=1, keepdims=True)
        oracle = rel_l2((p_pred - off).ravel(), p_ref.ravel())
        # per-case shape error distribution
        per_raw = [rel_l2(p_pred[i], p_ref[i]) for i in range(len(p_pred))]
        per_orc = [rel_l2(p_pred[i] - off[i], p_ref[i])
                   for i in range(len(p_pred))]
        print(f"  pooled relp raw={raw:.3%} oracle-centered={oracle:.3%}")
        print(f"  per-case mean raw={np.mean(per_raw):.3%} "
              f"centered={np.mean(per_orc):.3%} "
              f"max raw={np.max(per_raw):.3%} "
              f"centered={np.max(per_orc):.3%}")


if __name__ == "__main__":
    main()
