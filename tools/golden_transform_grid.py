"""Reference-scale FVM golden datasets: the duct transform grid.

Mirrors the reference's duct experiment data protocol at full scale, with the
in-repo FVM solver as the CFD engine:

  * ``fixed``: the 11-primitive mesh zoo x rotation grid x (x, y) scale grid of
    ``examples/duct_fixed_boundary/assets/meshes/standard/transforms.json``
    (reference parse: rotation = linspace(start, stop, n),
    scale = linspace(0.75, 1, 2) per axis -> 4 combos; 160 cases total),
    shuffled and split 60/20/20 train/val/test exactly like
    ``datagen/data_generator.py:201-231`` — so val/test contain *unseen
    geometry variants*.
  * ``variable``: the duct_variable_boundary protocol
    (``examples/duct_variable_boundary/generator_2d_variable.py:15-100`` +
    ``assets/meshes/standard/config.json``): the (d, f) coefficient grid
    (incl. the anisotropic d = [12000, 20000] pair) x 5 inlet speeds over the
    transformed-mesh zoo, each case kept with probability ``keep_p``, with a
    random inlet angle in [-30, 30] deg and 0.015 m/s inlet jitter.

Each case is solved to steady state (tol on |du/dt|_inf) and written in the
standard OpenFOAM-like layout with per-case solver wall time, then meta.json /
min_points.json / data_config.json are produced so the experiment CLIs consume
the splits directly.

Usage:
  python tools/golden_transform_grid.py fixed    [--root data/golden_grid]
  python tools/golden_transform_grid.py variable [--root data/golden_variable]
"""
import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from porous_cfd_tpu.datagen import fvm
from porous_cfd_tpu.datagen.meta import generate_meta, generate_min_points
from porous_cfd_tpu.datagen.synthetic_case import write_data_config

# transforms.json mirror: shape -> rotation (start, stop, n); scale grid is
# linspace(0.75, 1, 2) on x and y independently for every shape.
TRANSFORMS = {
    "circle": [],
    "semi_circle": [0, 315, 5],
    "circle_sector": [0, 315, 5],
    "equilateral_triangle": [30, 90, 3],
    "equilateral_hexagon": [0, 30, 2],
    "equilateral_octagon": [0, 22.5, 2],
    "trapezoid": [0, 315, 5],
    "square": [0, 85, 4],
    "star": [0, 85, 4],
    "ellipse": [0, 90, 4],
    "rectangle": [0, 135, 5],
}
BASE_SIZE = 0.14
CENTER = (0.1, 0.0)

# duct_variable_boundary config.json mirror ('cfd params')
VARIABLE_COEFFS = [
    {"d": 5000.0, "f": 16.381},
    {"d": 7000.0, "f": 20.783},
    {"d": 9000.0, "f": 24.923},
    {"d": (12000.0, 20000.0), "f": 30.80},
]
VARIABLE_INLETS = [0.1, 0.125, 0.15, 0.175, 0.2]
VARIABLE_ANGLE = (-30.0, 30.0)
VARIABLE_INLET_JITTER = 0.015

SPLITS = {"train": 0.6, "val": 0.2, "test": 0.2}
SEED = 8421


def rotations(spec, rot_mult=1):
    if not spec:
        return [0.0]
    n = int(spec[2]) + (int(spec[2]) - 1) * (rot_mult - 1)
    return np.linspace(spec[0], spec[1], n).tolist()


def scale_grid(scale_n=2):
    s = np.linspace(0.75, 1.0, scale_n)
    return [(float(a), float(b)) for a in s for b in s]


def enumerate_meshes(scale_n=2, rot_mult=1):
    """All transformed geometries (shape, rotation deg, sx, sy).

    ``scale_n``/``rot_mult`` densify the reference grid (scale linspace gets
    scale_n points per axis; rotation linspaces get intermediate midpoints)
    while keeping the reference corners, for data-scaling studies.
    """
    out = []
    for shape, rot in TRANSFORMS.items():
        for r in rotations(rot, rot_mult):
            for sx, sy in scale_grid(scale_n):
                out.append({"shape": shape, "rot": float(r),
                            "sx": sx, "sy": sy})
    return out


def split_cases(cases, rng):
    """Shuffle + 60/20/20 split (data_generator.py:201-231 semantics)."""
    order = rng.permutation(len(cases))
    n_train = int(len(cases) * SPLITS["train"])
    n_val = int(len(cases) * SPLITS["val"])
    return {
        "train": [cases[i] for i in order[:n_train]],
        "val": [cases[i] for i in order[n_train:n_train + n_val]],
        "test": [cases[i] for i in order[n_train + n_val:]],
    }


def _solve_params(case):
    cx, cy = CENTER
    return dict(shape=case["shape"], cx=cx, cy=cy, size=BASE_SIZE,
                theta=float(np.radians(case["rot"])),
                sx=case["sx"], sy=case["sy"],
                u_inlet=case.get("u_x", fvm.U_INLET),
                v_inlet=case.get("u_y", 0.0),
                d=case.get("d", fvm.DARCY_D), f=case.get("f", fvm.FORCH_F))


def solve_and_write(case, case_dir, nx, ny, n_internal, rng,
                    max_steps=30000, tol=1e-4):
    p = _solve_params(case)
    t0 = time.perf_counter_ns()
    sol = fvm.solve_duct(nx=nx, ny=ny, max_steps=max_steps, tol=tol, **p)
    elapsed = time.perf_counter_ns() - t0
    fvm.solution_to_case(
        sol, case_dir, n_internal=n_internal, rng=rng,
        d=p["d"], f=p["f"], u_inlet=p["u_inlet"], v_inlet=p["v_inlet"],
        elapsed_ns=elapsed)
    return sol


def solve_cases(cases, nx, ny, solver="numpy", chunk=160,
                max_steps=30000):
    """Yield (index, case, DuctSolution, per_case_elapsed_ns, solver_meta)
    for every case.

    ``solver='numpy'`` is the sequential f64 reference (tol 1e-4);
    ``solver='batch'`` marches chunks of cases as one ``lax.while_loop`` on
    the default JAX device via ``datagen/fvm_tpu.py`` (f32, tol 2e-4 — the
    f32 update-norm noise floor; field agreement with the numpy solver is
    regression-tested in tests/test_fvm_tpu.py). ``solver_meta`` records the
    solver mode, per-case achieved residual/steps, and the timing mode —
    batch-mode elapsed_ns is a chunk average (the first chunk's includes the
    JIT compile), not a per-case measurement (ADVICE r4)."""
    if solver == "numpy":
        for i, case in enumerate(cases):
            t0 = time.perf_counter_ns()
            sol = fvm.solve_duct(nx=nx, ny=ny, max_steps=max_steps, tol=1e-4,
                                 **_solve_params(case))
            meta = {"solver": "numpy_f64", "tol": 1e-4,
                    "residual": float(sol.residual), "steps": int(sol.steps),
                    "elapsed_mode": "per_case"}
            yield i, case, sol, time.perf_counter_ns() - t0, meta
        return
    from porous_cfd_tpu.datagen.fvm_tpu import solve_duct_batch
    first_chunk = True
    for c0 in range(0, len(cases), chunk):
        part = cases[c0:c0 + chunk]
        t0 = time.perf_counter_ns()
        sols = solve_duct_batch([_solve_params(c) for c in part],
                                nx=nx, ny=ny, tol=2e-4, max_steps=max_steps)
        per_case = (time.perf_counter_ns() - t0) // max(1, len(part))
        mode = ("chunk_average_incl_jit_compile" if first_chunk
                else "chunk_average")
        first_chunk = False
        for j, (case, sol) in enumerate(zip(part, sols)):
            meta = {"solver": "batch_f32", "tol": 2e-4,
                    "residual": float(sol.residual), "steps": int(sol.steps),
                    "elapsed_mode": mode}
            yield c0 + j, case, sol, per_case, meta


def case_name(i, case):
    tag = (f"{case['shape']}_r{case['rot']:g}"
           f"_s{case['sx']:g}-{case['sy']:g}")
    if "u_x" in case:
        d = case["d"]
        d0 = d[0] if np.ndim(d) else d
        tag += f"_d{d0:g}_in{np.hypot(case['u_x'], case['u_y']):.4f}"
    return f"case_{i:03d}_{tag}"


def generate(root, splits, nx, ny, n_internal, variable, solver="numpy"):
    root = Path(root)
    manifest = {}
    for split, cases in splits.items():
        print(f"[{split}] solving {len(cases)} cases at {nx}x{ny} "
              f"(solver={solver}) ...", flush=True)
        t0 = time.time()
        for i, case, sol, elapsed_ns, smeta in solve_cases(cases, nx, ny,
                                                           solver):
            p = _solve_params(case)
            fvm.solution_to_case(
                sol, root / split / case_name(i, case),
                n_internal=n_internal, rng=np.random.default_rng(SEED + i),
                d=p["d"], f=p["f"], u_inlet=p["u_inlet"],
                v_inlet=p["v_inlet"], elapsed_ns=elapsed_ns,
                solver_meta=smeta)
            if sol.residual > 1e-3:
                print(f"  WARNING {case_name(i, case)}: residual "
                      f"{sol.residual:.2e} after {sol.steps} steps",
                      flush=True)
            if (i + 1) % 20 == 0:
                print(f"  {i + 1}/{len(cases)} "
                      f"({time.time() - t0:.0f}s)", flush=True)
        manifest[split] = [case_name(i, c) for i, c in enumerate(cases)]

        fields = ["C", "U", "p", "cellToRegion"]
        norm = {"Scale": [], "Standardize": ["C", "U", "p"]}
        var_bounds = {}
        if variable:
            fields += ["d", "f"]
            norm = {"Scale": ["d", "f"], "Standardize": ["C", "U", "p"]}
            var_bounds = {"U": "inlet"}
        write_data_config(root / split, fields, var_bounds, norm, ["x", "y"])
        generate_meta(root / split, *fields, max_dim=2)
        print(f"[{split}] done in {time.time() - t0:.0f}s", flush=True)
    generate_min_points(root)
    with open(root / "manifest.json", "w") as fh:
        json.dump({"splits": manifest,
                   "grid": {"nx": nx, "ny": ny, "base_size": BASE_SIZE},
                   "seed": SEED}, fh, indent=2)


def patch_train(args):
    """Targeted train-only densification for the variable grid: extra cases
    for the named shapes at rotation MIDPOINTS of the reference linspaces
    (disjoint from every base-grid rotation, so no held-out geometry variant
    is duplicated into training), swept over the full coefficient x inlet
    grid with ``--keep-p``. Motivated by the round-4 per-case analysis: the
    val-p residual concentrates on single held-out rotation variants (e.g.
    square_r56.67), i.e. rotation-grid extrapolation — the same failure mode
    the fixed grid cured with --rot-mult midpoints."""
    root = Path(args.root or "data/golden_variable")
    train_dir = root / "train"
    existing = sorted(d.name for d in train_dir.iterdir() if d.is_dir())
    offset = len(existing)
    shapes = set(args.patch_shapes.split(","))
    rng = np.random.default_rng(SEED + 7)

    base, dense = set(), []
    for shape, rot in TRANSFORMS.items():
        if shape not in shapes:
            continue
        base.update((shape, float(r)) for r in rotations(rot, 1))
        for r in rotations(rot, 2):
            if (shape, float(r)) not in base:
                for sx, sy in scale_grid(args.scale_n):
                    dense.append({"shape": shape, "rot": float(r),
                                  "sx": sx, "sy": sy})
    cases = []
    for coeffs in VARIABLE_COEFFS:
        for inlet in VARIABLE_INLETS:
            for mesh in dense:
                if rng.random() > args.keep_p:
                    continue
                u = inlet + rng.uniform(-VARIABLE_INLET_JITTER / 2,
                                        VARIABLE_INLET_JITTER / 2)
                angle = np.radians(rng.uniform(*VARIABLE_ANGLE))
                cases.append({**mesh, "d": coeffs["d"], "f": coeffs["f"],
                              "u_x": u * np.cos(angle),
                              "u_y": u * np.sin(angle),
                              "angle_deg": float(np.degrees(angle))})
    print(f"patch: {len(cases)} extra train cases for {sorted(shapes)} "
          f"at midpoint rotations (existing train: {offset})", flush=True)
    t0 = time.time()
    for i, case, sol, elapsed_ns, smeta in solve_cases(cases, args.nx,
                                                       args.ny, args.solver):
        p = _solve_params(case)
        fvm.solution_to_case(
            sol, train_dir / case_name(offset + i, case),
            n_internal=args.n_internal,
            rng=np.random.default_rng(SEED + offset + i),
            d=p["d"], f=p["f"], u_inlet=p["u_inlet"], v_inlet=p["v_inlet"],
            elapsed_ns=elapsed_ns, solver_meta=smeta)
        if sol.residual > 1e-3:
            print(f"  WARNING {case_name(offset + i, case)}: residual "
                  f"{sol.residual:.2e}", flush=True)
        if (i + 1) % 20 == 0:
            print(f"  {i + 1}/{len(cases)} ({time.time() - t0:.0f}s)",
                  flush=True)
    fields = ["C", "U", "p", "cellToRegion", "d", "f"]
    generate_meta(train_dir, *fields, max_dim=2)
    generate_min_points(root)
    print(f"patch done in {time.time() - t0:.0f}s", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["fixed", "variable"])
    ap.add_argument("--root", default=None)
    ap.add_argument("--nx", type=int, default=120)
    ap.add_argument("--ny", type=int, default=72)
    ap.add_argument("--n-internal", type=int, default=4000,
                    help="internal cell subsample per case (full grid is "
                         "nx*ny); keeps parse/disk cost bounded")
    ap.add_argument("--keep-p", type=float, default=0.05,
                    help="variable mode: per-combination keep probability "
                         "(reference drop_p semantics)")
    ap.add_argument("--scale-n", type=int, default=2,
                    help="points per scale axis in linspace(0.75, 1.0, n); "
                         "2 = reference grid, 3 = densified")
    ap.add_argument("--rot-mult", type=int, default=1,
                    help="rotation densification: 2 inserts midpoints into "
                         "every reference rotation linspace")
    ap.add_argument("--solver", choices=["numpy", "batch"], default="numpy",
                    help="'batch' marches chunks of cases as one batched "
                         "lax.while_loop on the default JAX device "
                         "(datagen/fvm_tpu.py) — minutes instead of hours "
                         "for the reference-scale grids")
    ap.add_argument("--patch-shapes", default="",
                    help="variable mode: generate EXTRA train-only cases "
                         "for these shapes (comma list) at rotation "
                         "MIDPOINTS only (never the base grid's rotations, "
                         "so no val/test geometry is duplicated), appended "
                         "to an existing --root train split; regenerates "
                         "the train meta/min_points")
    args = ap.parse_args()

    if args.patch_shapes:
        patch_train(args)
        return

    rng = np.random.default_rng(SEED)
    meshes = enumerate_meshes(args.scale_n, args.rot_mult)
    if args.mode == "fixed":
        root = args.root or "data/golden_grid"
        splits = split_cases(meshes, rng)
    else:
        root = args.root or "data/golden_variable"
        cases = []
        for coeffs in VARIABLE_COEFFS:
            for inlet in VARIABLE_INLETS:
                for mesh in meshes:
                    if rng.random() > args.keep_p:
                        continue
                    u = inlet + rng.uniform(-VARIABLE_INLET_JITTER / 2,
                                            VARIABLE_INLET_JITTER / 2)
                    angle = np.radians(rng.uniform(*VARIABLE_ANGLE))
                    cases.append({**mesh, "d": coeffs["d"], "f": coeffs["f"],
                                  "u_x": u * np.cos(angle),
                                  "u_y": u * np.sin(angle),
                                  "angle_deg": float(np.degrees(angle))})
        print(f"variable grid: kept {len(cases)} of "
              f"{len(VARIABLE_COEFFS) * len(VARIABLE_INLETS) * len(meshes)} "
              "combinations", flush=True)
        splits = split_cases(cases, rng)
    generate(root, splits, args.nx, args.ny, args.n_internal,
             variable=(args.mode == "variable"), solver=args.solver)


if __name__ == "__main__":
    main()
