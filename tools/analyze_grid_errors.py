"""Per-case held-out error analysis for the transform-grid golden dataset.

Scores the trained grid checkpoint per CASE (not pooled) on every split and
correlates rel-L2 with the case's transform parameters (shape, rotation,
scale) parsed from the case directory name, to show whether held-out pressure
error is broad or concentrated in specific transform variants.

Usage: python tools/analyze_grid_errors.py [--root data/golden_grid]
       [--name grid-pipn-analytic]
"""
import argparse
import json
import re
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def rel_l2(pred, ref, axis=None):
    return np.linalg.norm(pred - ref, axis=axis) / np.linalg.norm(ref,
                                                                  axis=axis)


def parse_case(name):
    # case_000_ellipse_r90_s1-0.75
    m = re.match(r"case_\d+_(.+)_r([\d.+-]+)_s([\d.]+)-([\d.]+)$", name)
    if not m:
        return {"shape": name, "rot": 0.0, "sx": 1.0, "sy": 1.0}
    return {"shape": m.group(1), "rot": float(m.group(2)),
            "sx": float(m.group(3)), "sy": float(m.group(4))}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="data/golden_grid")
    ap.add_argument("--name", default="grid-pipn-analytic")
    ap.add_argument("--n-internal", type=int, default=1500)
    ap.add_argument("--n-boundary", type=int, default=350)
    ap.add_argument("--n-obs", type=int, default=700)
    args = ap.parse_args()

    import jax.numpy as jnp

    from examples.duct_fixed_boundary.train import get_model
    from porous_cfd_tpu.data.dataset import FoamDataset
    from porous_cfd_tpu.train.engine import (gather_cases, make_optimizer,
                                             make_train_functions)
    from porous_cfd_tpu.train.trainer import load_checkpoint

    root = Path(args.root).resolve()
    ckpt = root / "logs" / "lightning_logs" / args.name / "model.ckpt"
    train_ds = FoamDataset(str(root / "train"), args.n_internal,
                           args.n_boundary, args.n_obs,
                           np.random.default_rng(8421))
    fast = "exact" not in args.name
    model = get_model(argparse.Namespace(model="pipn",
                                         fast_derivatives=fast),
                      train_ds.normalizers)
    state, _ = load_checkpoint(str(ckpt), model, train_ds.stacked())
    fns = make_train_functions(model, make_optimizer(model, 1))
    u_s, p_s = train_ds.normalizers["U"], train_ds.normalizers["p"]

    rows = []
    for split in ("train", "val", "test"):
        ds = FoamDataset(str(root / split), args.n_internal, args.n_boundary,
                         args.n_obs, np.random.default_rng(8421),
                         meta_dir=str(root / "train"))
        batch = gather_cases(ds.stacked(), jnp.arange(len(ds)))
        pred = fns.predict_batch(state.params, batch, False).numpy()
        u_pred = np.asarray(u_s.inverse_transform(pred["U"]))
        u_ref = np.asarray(u_s.inverse_transform(np.asarray(batch["U"])))
        p_pred = np.asarray(p_s.inverse_transform(pred["p"]))
        p_ref = np.asarray(p_s.inverse_transform(np.asarray(batch["p"])))
        names = [Path(c).name for c in ds.samples]
        for i, name in enumerate(names):
            info = parse_case(name)
            rows.append({
                "split": split, "case": name, **info,
                "relU": float(rel_l2(u_pred[i].ravel(), u_ref[i].ravel())),
                "relp": float(rel_l2(p_pred[i].ravel(), p_ref[i].ravel())),
                "p_range": float(p_ref[i].max() - p_ref[i].min()),
                "p_mean_err": float(np.mean(p_pred[i] - p_ref[i])),
                "p_rms": float(np.sqrt(np.mean(p_ref[i] ** 2))),
            })

    out = root / "per_case_errors.json"
    out.write_text(json.dumps(rows, indent=1))
    print(f"wrote {out} ({len(rows)} cases)")

    for split in ("train", "val", "test"):
        sub = [r for r in rows if r["split"] == split]
        sub.sort(key=lambda r: -r["relp"])
        pv = np.array([r["relp"] for r in sub])
        print(f"\n[{split}] n={len(sub)} median relp={np.median(pv):.3%} "
              f"mean={pv.mean():.3%} max={pv.max():.3%}")
        for r in sub[:8]:
            print(f"  {r['case']:45s} relp={r['relp']:.2%} "
                  f"relU={r['relU']:.2%} p_range={r['p_range']:.4g} "
                  f"mean_err={r['p_mean_err']:+.4g}")


if __name__ == "__main__":
    main()
