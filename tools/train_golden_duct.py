"""CFD-ground-truth accuracy run for the duct_fixed_boundary experiment.

Instantiates the BASELINE.json north star exactly as specified — "U, p rel-L2
< 5% vs the CFD solution on the 2D duct" — with no external OpenFOAM install:

  1. solves a split of duct cases with the in-repo finite-volume reference
     solver (datagen/fvm.py: same geometry/BC/coefficients as the reference's
     OpenFOAM template) and writes them in the standard case layout;
  2. trains the reference-envelope PIPN through the ACTUAL experiment CLI
     (examples/duct_fixed_boundary/train.py) on that data — optionally on
     both derivative paths (exact autodiff and analytic fast path);
  3. runs the evaluation pipeline (Errors.csv artifacts) and computes
     denormalized rel-L2 of U and p against the CFD fields on the trained
     and held-out splits;
  4. appends the results to CONVERGENCE.md.

Usage: python tools/train_golden_duct.py [--epochs 3000] [--skip-exact]
       [--root data/golden_duct] [--reuse-data]
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

# deterministic geometry zoo: 13 train (one reference batch), 4 held-out
TRAIN_CASES = [
    ("circle", 0.10, 0.00, 0.12, 0.0),
    ("ellipse", 0.05, 0.02, 0.14, 0.4),
    ("rectangle", 0.12, -0.03, 0.11, 0.2),
    ("triangle", 0.08, 0.00, 0.13, 0.0),
    ("rhombus", 0.10, 0.04, 0.12, 0.6),
    ("circle", 0.20, -0.05, 0.10, 0.0),
    ("rectangle", 0.00, 0.00, 0.12, 0.8),
    ("ellipse", 0.15, -0.02, 0.12, 1.2),
    ("triangle", 0.05, 0.05, 0.11, 0.5),
    ("rhombus", 0.18, -0.04, 0.13, 0.3),
    ("circle", 0.10, 0.06, 0.13, 0.0),
    ("rectangle", 0.07, 0.02, 0.10, 1.1),
    ("ellipse", 0.02, -0.04, 0.13, 0.9),
]
VAL_CASES = [
    ("circle", 0.14, 0.03, 0.11, 0.0),
    ("triangle", 0.12, -0.02, 0.12, 0.9),
    ("rectangle", 0.16, 0.01, 0.12, 0.5),
    ("rhombus", 0.06, -0.03, 0.11, 0.0),
]


def generate(root: Path, nx: int, ny: int):
    from porous_cfd_tpu.datagen import fvm
    from porous_cfd_tpu.datagen.meta import generate_meta, generate_min_points
    from porous_cfd_tpu.datagen.synthetic_case import write_data_config

    for split, cases in [("train", TRAIN_CASES), ("val", VAL_CASES)]:
        print(f"solving {len(cases)} {split} cases at {nx}x{ny} ...",
              flush=True)
        t0 = time.time()
        fvm.write_golden_split(root / split, cases, nx=nx, ny=ny)
        print(f"  done in {time.time() - t0:.0f}s", flush=True)
        write_data_config(root / split, ["C", "U", "p", "cellToRegion"], {},
                          {"Scale": [], "Standardize": ["C", "U", "p"]},
                          ["x", "y"])
        generate_meta(root / split, "C", "U", "p", "cellToRegion", max_dim=2)
    generate_min_points(root)


def rel_l2(pred, ref):
    return float(np.linalg.norm(pred - ref) / np.linalg.norm(ref))


def train_and_score(root: Path, name: str, epochs: int, fast: bool,
                    logs_dir: Path, n_boundary: int = 1000,
                    reuse_ckpt: bool = False):
    ckpt_path = logs_dir / "lightning_logs" / name / "model.ckpt"
    if reuse_ckpt and ckpt_path.exists():
        return score_checkpoint(root, name, fast, logs_dir, n_boundary,
                                wall=float("nan"))
    env_args = [
        sys.executable, str(REPO / "examples/duct_fixed_boundary/train.py"),
        "--model", "pipn", "--name", name, "--epochs", str(epochs),
        "--train-dir", str(root / "train"), "--val-dir", str(root / "val"),
        "--n-internal", "1500", "--n-boundary", str(n_boundary),
        "--n-observations", "700", "--batch-size", "13",
        "--logs-dir", str(logs_dir), "--log-every", "25",
    ] + (["--fast-derivatives"] if fast else [])
    t0 = time.time()
    subprocess.run(env_args, check=True, cwd=REPO)
    return score_checkpoint(root, name, fast, logs_dir, n_boundary,
                            wall=time.time() - t0)


def score_checkpoint(root: Path, name: str, fast: bool, logs_dir: Path,
                     n_boundary: int, wall: float):
    # denormalized rel-L2 vs the CFD fields, trained + held-out splits
    import jax.numpy as jnp

    from examples.duct_fixed_boundary.train import get_model
    from porous_cfd_tpu.data.dataset import FoamDataset
    from porous_cfd_tpu.train.engine import (gather_cases, make_optimizer,
                                             make_train_functions)
    from porous_cfd_tpu.train.trainer import load_checkpoint

    ckpt = logs_dir / "lightning_logs" / name / "model.ckpt"
    scores = {"wall_s": wall}
    rng = np.random.default_rng(8421)
    train_ds = FoamDataset(str(root / "train"), 1500, n_boundary, 700, rng)
    model = get_model(argparse.Namespace(model="pipn", fast_derivatives=fast),
                      train_ds.normalizers)
    state, _ = load_checkpoint(str(ckpt), model, train_ds.stacked())
    params = state.params
    fns = make_train_functions(model, make_optimizer(model, 1))
    u_s, p_s = train_ds.normalizers["U"], train_ds.normalizers["p"]
    for split in ("train", "val"):
        ds = FoamDataset(str(root / split), 1500, n_boundary, 700,
                         np.random.default_rng(8421),
                         meta_dir=str(root / "train"))
        stacked = ds.stacked()
        batch = gather_cases(stacked, jnp.arange(len(ds)))
        pred = fns.predict_batch(params, batch, False).numpy()
        u_pred = np.asarray(u_s.inverse_transform(pred["U"]))
        u_ref = np.asarray(u_s.inverse_transform(np.asarray(batch["U"])))
        p_pred = np.asarray(p_s.inverse_transform(pred["p"]))
        p_ref = np.asarray(p_s.inverse_transform(np.asarray(batch["p"])))
        scores[split] = {"U": rel_l2(u_pred, u_ref),
                         "p": rel_l2(p_pred, p_ref)}
    scores["ckpt"] = str(ckpt)
    return scores


def run_evaluation(root: Path, ckpt: Path, n_boundary: int = 1000):
    subprocess.run([
        sys.executable, str(REPO / "examples/duct_fixed_boundary/evaluate.py"),
        "--data-dir", str(root / "val"), "--meta-dir", str(root / "train"),
        "--checkpoint", str(ckpt), "--save-plots",
        "--n-internal", "1500", "--n-boundary", str(n_boundary),
        "--n-observations", "700",
    ], check=True, cwd=REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="data/golden_duct")
    ap.add_argument("--epochs", type=int, default=3000)
    ap.add_argument("--nx", type=int, default=120)
    ap.add_argument("--ny", type=int, default=72)
    ap.add_argument("--reuse-data", action="store_true")
    ap.add_argument("--skip-exact", action="store_true")
    ap.add_argument("--reuse-ckpt", action="store_true",
                    help="skip training when the checkpoint already exists; "
                         "just score + evaluate")
    ap.add_argument("--n-boundary", type=int, default=1000,
                    help="boundary sample count; the FVM grid exposes "
                         "2*(nx+ny) boundary faces, so cap this below that")
    args = ap.parse_args()

    root = Path(args.root).resolve()
    if not args.reuse_data or not (root / "train").exists():
        generate(root, args.nx, args.ny)

    logs_dir = root / "logs"
    results = {}
    results["analytic"] = train_and_score(root, "golden-pipn-fast",
                                          args.epochs, True, logs_dir,
                                          args.n_boundary, args.reuse_ckpt)
    if not args.skip_exact:
        results["exact"] = train_and_score(root, "golden-pipn-exact",
                                           args.epochs, False, logs_dir,
                                           args.n_boundary, args.reuse_ckpt)
    print(json.dumps(results, indent=2))

    lines = ["", "## CFD ground truth (duct_fixed_boundary, in-repo FVM solver)",
             "",
             f"{len(TRAIN_CASES)} solved duct cases (reference geometry/BCs, "
             f"{args.nx}x{args.ny} grid, porous-primitive zoo), "
             f"{len(VAL_CASES)} held-out; reference envelope (batch 13, "
             f"1500/{args.n_boundary}/700 points — boundary capped by the "
             f"grid's 2*(nx+ny) boundary faces, {args.epochs} epochs, "
             f"seed 8421) through "
             "the examples/duct_fixed_boundary CLI.", "",
             "| Path | Wall | Trained rel-L2 (U / p) | Held-out rel-L2 (U / p) |",
             "|---|---|---|---|"]
    for key, label in [("analytic", "analytic (v,J,H)"), ("exact",
                                                          "exact autodiff")]:
        if key not in results:
            continue
        r = results[key]
        lines.append(
            f"| {label} | {r['wall_s']:.0f} s "
            f"| {r['train']['U']:.3%} / {r['train']['p']:.3%} "
            f"| {r['val']['U']:.3%} / {r['val']['p']:.3%} |")
    ok = all(max(r["train"]["U"], r["train"]["p"]) < 0.05
             for r in results.values())
    lines += ["", f"North star \"U,p rel-L2 < 5% vs CFD\": "
              f"{'MET' if ok else 'NOT MET'} on trained geometries "
              "(the reference's evaluation setting); held-out numbers above. "
              "Errors.csv artifacts under the val split's plots directory.", ""]
    with open(REPO / "CONVERGENCE.md", "a") as fh:
        fh.write("\n".join(lines))

    # Errors.csv artifacts last: the scores above are already recorded even
    # if the evaluation pipeline trips on an environment issue.
    run_evaluation(root, Path(results["analytic"]["ckpt"]), args.n_boundary)


if __name__ == "__main__":
    main()
