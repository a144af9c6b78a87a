"""Variable-coefficient CFD validation: train PI-GANO on the solved-physics
variable-boundary golden dataset (tools/golden_transform_grid.py variable
mode — the reference's (d, f) x inlet-speed x inlet-angle protocol over the
transformed-mesh zoo, ``duct_variable_boundary/generator_2d_variable.py``
+ config.json) through the real experiment CLI, score denormalized U/p
rel-L2 on train/val/test, and produce the experiment's evaluation artifacts
(MAE-vs-angle curve, (d, U) MAE heatmap, pressure-drop metric, Errors.csv).

Closes VERDICT r2 missing #2 / next #3: the PI-GANO family had never seen
solved physics end-to-end.

Usage: python tools/train_golden_variable.py [--epochs 3000] [--model pi-gano]
       [--reuse-ckpt] [--root data/golden_variable]
"""
import argparse
import json
import subprocess
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def rel_l2(pred, ref):
    return float(np.linalg.norm(pred - ref) / np.linalg.norm(ref))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="data/golden_variable")
    ap.add_argument("--epochs", type=int, default=3000)
    ap.add_argument("--model", default="pi-gano")
    ap.add_argument("--n-internal", type=int, default=1500)
    ap.add_argument("--n-boundary", type=int, default=350)
    ap.add_argument("--n-obs", type=int, default=700)
    ap.add_argument("--reuse-ckpt", action="store_true")
    ap.add_argument("--skip-eval", action="store_true")
    ap.add_argument("--resample-every", type=int, default=0)
    ap.add_argument("--tag", default="goldenvar")
    args = ap.parse_args()

    root = Path(args.root).resolve()
    logs_dir = root / "logs"
    name = f"{args.tag}-{args.model}"
    ckpt = logs_dir / "lightning_logs" / name / "model.ckpt"
    wall = float("nan")
    if not (args.reuse_ckpt and ckpt.exists()):
        t0 = time.time()
        subprocess.run([
            sys.executable,
            str(REPO / "examples/duct_variable_boundary/train.py"),
            "--model", args.model, "--name", name,
            "--epochs", str(args.epochs),
            "--train-dir", str(root / "train"), "--val-dir", str(root / "val"),
            "--n-internal", str(args.n_internal),
            "--n-boundary", str(args.n_boundary),
            "--n-observations", str(args.n_obs), "--batch-size", "13",
            "--logs-dir", str(logs_dir), "--log-every", "25",
            "--resample-every", str(args.resample_every),
        ], check=True, cwd=REPO)
        wall = time.time() - t0

    import jax.numpy as jnp

    from examples.duct_variable_boundary.train import get_model
    from porous_cfd_tpu.data.dataset import FoamDataset
    from porous_cfd_tpu.train.engine import (gather_cases, make_optimizer,
                                             make_train_functions)
    from porous_cfd_tpu.train.trainer import load_checkpoint

    train_ds = FoamDataset(str(root / "train"), args.n_internal,
                           args.n_boundary, args.n_obs,
                           np.random.default_rng(8421))
    model = get_model(argparse.Namespace(model=args.model),
                      train_ds.normalizers)
    state, _ = load_checkpoint(str(ckpt), model, train_ds.stacked())
    fns = make_train_functions(model, make_optimizer(model, 1))
    u_s, p_s = train_ds.normalizers["U"], train_ds.normalizers["p"]
    scores = {"wall_s": wall}
    from tools.scoring_util import split_rel_l2
    for split in ("train", "val", "test"):
        ds = FoamDataset(str(root / split), args.n_internal, args.n_boundary,
                         args.n_obs, np.random.default_rng(8421),
                         meta_dir=str(root / "train"))
        # chunked predict: one whole-split device batch OOMs for the pp
        # families (their attached neighbor structures multiply the per-case
        # footprint); sum-of-squares accumulation keeps split rel-L2 exact.
        scores[split] = split_rel_l2(fns, state.params, ds.stacked(), len(ds),
                                     {"U": u_s, "p": p_s})
    print(json.dumps(scores, indent=2))

    n_cases = sum(sum(1 for d in (root / s).iterdir() if d.is_dir())
                  for s in ("train", "val", "test"))
    lines = ["", f"## Variable-coefficient CFD ground truth "
             f"(duct_variable_boundary, {args.model}, FVM solver)", "",
             f"{n_cases} solved cases sweeping the reference's (d, f) coefficient "
             "grid (incl. the anisotropic d = [12000, 20000] pair) x 5 inlet "
             "speeds x random inlet angle in [-30, 30] deg x transformed-"
             "mesh zoo (keep-p protocol), split 60/20/20 with held-out "
             f"combinations; {args.model} through the "
             f"examples/duct_variable_boundary CLI ({args.epochs} epochs, "
             f"batch 13, {args.n_internal}/{args.n_boundary}/{args.n_obs} "
             "points, seed 8421) on 1 TPU chip.", "",
             "| Wall | Train rel-L2 (U / p) | Val rel-L2 (U / p) "
             "| Test rel-L2 (U / p) |", "|---|---|---|---|",
             f"| {wall:.0f} s "
             f"| {scores['train']['U']:.3%} / {scores['train']['p']:.3%} "
             f"| {scores['val']['U']:.3%} / {scores['val']['p']:.3%} "
             f"| {scores['test']['U']:.3%} / {scores['test']['p']:.3%} |",
             ""]
    with open(REPO / "CONVERGENCE.md", "a") as fh:
        fh.write("\n".join(lines))
    print("\n".join(lines))

    if not args.skip_eval:
        # MAE-vs-angle, (d, U) heatmap, pressure drop, Errors.csv artifacts
        subprocess.run([
            sys.executable,
            str(REPO / "examples/duct_variable_boundary/evaluate.py"),
            "--data-dir", str(root / "test"),
            "--meta-dir", str(root / "train"),
            "--checkpoint", str(ckpt), "--save-plots",
            "--n-internal", str(args.n_internal),
            "--n-boundary", str(args.n_boundary),
            "--n-observations", str(args.n_obs),
        ], check=True, cwd=REPO)


if __name__ == "__main__":
    main()
