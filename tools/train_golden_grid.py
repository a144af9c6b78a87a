"""Accuracy north star at reference data scale: train the duct PIPN on the
FVM transform-grid dataset (tools/golden_transform_grid.py fixed mode — the
11-primitive zoo x rotation x scale grid, 96/32/32 train/val/test with
*held-out geometry variants*, mirroring the reference's
duct_fixed_boundary split protocol) through the actual experiment CLI, then
score denormalized U/p rel-L2 on all three splits and append to
CONVERGENCE.md.

Usage: python tools/train_golden_grid.py [--epochs 3000] [--reuse-ckpt]
       [--root data/golden_grid] [--model pipn] [--skip-exact]
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


def train(root: Path, name: str, epochs: int, fast: bool, logs_dir: Path,
          n_boundary: int, model: str = "pipn", decoupled: bool = False,
          resample_every: int = 0):
    args = [
        sys.executable, str(REPO / "examples/duct_fixed_boundary/train.py"),
        "--model", model, "--name", name, "--epochs", str(epochs),
        "--train-dir", str(root / "train"), "--val-dir", str(root / "val"),
        "--n-internal", "1500", "--n-boundary", str(n_boundary),
        "--n-observations", "700", "--batch-size", "13",
        "--logs-dir", str(logs_dir), "--log-every", "25",
        "--resample-every", str(resample_every),
    ] + ([] if fast else ["--exact-derivatives"]) \
      + (["--coupled-context"] if fast and not decoupled else [])
    t0 = time.time()
    subprocess.run(args, check=True, cwd=REPO)
    return time.time() - t0


def score(root: Path, name: str, fast: bool, logs_dir: Path, n_boundary: int,
          wall: float, model_name: str = "pipn"):
    import jax.numpy as jnp

    from examples.duct_fixed_boundary.train import get_model
    from porous_cfd_tpu.data.dataset import FoamDataset
    from porous_cfd_tpu.train.engine import (gather_cases, make_optimizer,
                                             make_train_functions)
    from porous_cfd_tpu.train.trainer import load_checkpoint

    ckpt = logs_dir / "lightning_logs" / name / "model.ckpt"
    scores = {"wall_s": wall, "ckpt": str(ckpt)}
    train_ds = FoamDataset(str(root / "train"), 1500, n_boundary, 700,
                           np.random.default_rng(8421))
    model = get_model(argparse.Namespace(model=model_name,
                                         fast_derivatives=fast),
                      train_ds.normalizers)
    state, _ = load_checkpoint(str(ckpt), model, train_ds.stacked())
    fns = make_train_functions(model, make_optimizer(model, 1))
    u_s, p_s = train_ds.normalizers["U"], train_ds.normalizers["p"]
    from tools.scoring_util import split_rel_l2
    for split in ("train", "val", "test"):
        ds = FoamDataset(str(root / split), 1500, n_boundary, 700,
                         np.random.default_rng(8421),
                         meta_dir=str(root / "train"))
        scores[split] = split_rel_l2(fns, state.params, ds.stacked(), len(ds),
                                     {"U": u_s, "p": p_s})
    return scores


def run_evaluation(root: Path, ckpt: Path, n_boundary: int, split: str):
    subprocess.run([
        sys.executable, str(REPO / "examples/duct_fixed_boundary/evaluate.py"),
        "--data-dir", str(root / split), "--meta-dir", str(root / "train"),
        "--checkpoint", str(ckpt), "--save-plots",
        "--n-internal", "1500", "--n-boundary", str(n_boundary),
        "--n-observations", "700",
    ], check=True, cwd=REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="data/golden_grid")
    ap.add_argument("--epochs", type=int, default=3000)
    ap.add_argument("--model", default="pipn")
    ap.add_argument("--n-boundary", type=int, default=350)
    ap.add_argument("--skip-exact", action="store_true")
    ap.add_argument("--resample-every", type=int, default=0)
    ap.add_argument("--tag", default="grid")
    ap.add_argument("--reuse-ckpt", action="store_true")
    ap.add_argument("--skip-eval", action="store_true")
    ap.add_argument("--paths", default="",
                    help="comma list of derivative paths to run "
                         "(analytic,decoupled,exact); empty = all "
                         "(minus --skip-exact)")
    args = ap.parse_args()

    root = Path(args.root).resolve()
    logs_dir = root / "logs"
    results = {}
    all_paths = [("analytic", True, False), ("decoupled", True, True)] + (
        [] if args.skip_exact else [("exact", False, False)])
    if args.paths:
        wanted = set(args.paths.split(","))
        all_paths = [p for p in all_paths if p[0] in wanted]
    for key, fast, dec in all_paths:
        name = f"{args.tag}-{args.model}-{key}"
        ckpt = logs_dir / "lightning_logs" / name / "model.ckpt"
        wall = float("nan")
        if not (args.reuse_ckpt and ckpt.exists()):
            wall = train(root, name, args.epochs, fast, logs_dir,
                         args.n_boundary, args.model, dec,
                         args.resample_every)
        results[key] = score(root, name, fast, logs_dir, args.n_boundary,
                             wall, args.model)
        print(json.dumps(results[key], indent=2), flush=True)

    n_tr, n_va, n_te = (sum(1 for d in (root / s).iterdir() if d.is_dir())
                        for s in ("train", "val", "test"))
    lines = ["", "## Reference-scale transform grid "
             f"(duct_fixed_boundary, {args.model}, FVM CFD ground truth)", "",
             f"{n_tr + n_va + n_te}-case transform grid (11 primitives "
             "x rotations x x/y scales per the reference transforms.json), "
             f"{n_tr}/{n_va}/{n_te} "
             "train/val/test split with held-out geometry variants; "
             f"reference envelope (batch 13, 1500/{args.n_boundary}/700 "
             f"points, {args.epochs} epochs, seed 8421) through the "
             "examples/duct_fixed_boundary CLI on 1 TPU chip.", "",
             "| Path | Wall | Train rel-L2 (U / p) | Val rel-L2 (U / p) "
             "| Test rel-L2 (U / p) |", "|---|---|---|---|---|"]
    # "analytic" = the model family's fast (v,J,H) path: max-pool-coupled for
    # plain pipn (--coupled-context), decoupled-hierarchy for the ++/full
    # families (models/fp_analytic.py)
    for key, label in [("analytic", "analytic coupled (v,J,H) exactness mode"),
                       ("decoupled", "analytic decoupled, DEFAULT"),
                       ("exact", "exact autodiff")]:
        if key not in results:
            continue
        r = results[key]
        lines.append(
            f"| {label} | {r['wall_s']:.0f} s "
            f"| {r['train']['U']:.3%} / {r['train']['p']:.3%} "
            f"| {r['val']['U']:.3%} / {r['val']['p']:.3%} "
            f"| {r['test']['U']:.3%} / {r['test']['p']:.3%} |")
    held = [max(r["val"]["U"], r["val"]["p"], r["test"]["U"], r["test"]["p"])
            for r in results.values()]
    ok = all(h < 0.05 for h in held)
    lines += ["", "North star \"U,p rel-L2 < 5% vs CFD\" on HELD-OUT "
              f"geometry variants: {'MET' if ok else 'NOT MET'} "
              "(val and test splits contain transform variants never seen in "
              "training).", ""]
    with open(REPO / "CONVERGENCE.md", "a") as fh:
        fh.write("\n".join(lines))
    print("\n".join(lines))

    if not args.skip_eval:
        run_evaluation(root, Path(results["analytic"]["ckpt"]),
                       args.n_boundary, "test")


if __name__ == "__main__":
    main()
