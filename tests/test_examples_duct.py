"""duct_fixed_boundary experiment end-to-end through its CLI scripts on a
synthetic on-disk dataset: train -> inference plots -> evaluate with
momentError/div(phi) cross-check and pressure-drop metric."""
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parents[1]

FIELDS = ["C", "U", "p", "cellToRegion"]


def run_script(script, args, cwd):
    proc = subprocess.run(
        [sys.executable, str(REPO / "examples" / script)] + args,
        cwd=cwd, capture_output=True, text=True, timeout=900,
        env={"PYTHONPATH": str(REPO), "PATH": "/usr/bin:/bin:/usr/local/bin",
             "JAX_PLATFORMS": "cpu", "HOME": str(cwd)})
    assert proc.returncode == 0, f"{script} failed:\n{proc.stderr[-3000:]}"
    return proc


@pytest.mark.slow
def test_duct_fixed_cli_end_to_end(tmp_path):
    from porous_cfd_tpu.datagen import synthetic_case
    from porous_cfd_tpu.datagen.meta import generate_meta, generate_min_points
    rng = np.random.default_rng(8421)
    data = tmp_path / "data"
    for split, n in [("train", 3), ("val", 2), ("test", 2)]:
        synthetic_case.write_foam_split(data / split, n, rng, n_internal=200,
                                        n_per_patch=30)
        synthetic_case.write_data_config(
            data / split, fields=FIELDS, variable_boundaries={},
            normalize={"Scale": [], "Standardize": ["C", "U", "p"]},
            dims=["x", "y"])
        generate_meta(data / split, *FIELDS, max_dim=2)
    generate_min_points(data)

    common = ["--n-internal", "100", "--n-boundary", "40",
              "--n-observations", "20"]
    run_script("duct_fixed_boundary/train.py",
               ["--model", "pipn", "--name", "d", "--epochs", "2",
                "--batch-size", "2", *common,
                "--train-dir", str(data / "train"),
                "--val-dir", str(data / "val"),
                "--logs-dir", str(tmp_path)], cwd=tmp_path)
    ckpt = tmp_path / "lightning_logs" / "d" / "model.ckpt"
    assert ckpt.exists()

    run_script("duct_fixed_boundary/inference.py",
               ["--checkpoint", str(ckpt), "--save-plots", *common,
                "--data-dir", str(data / "test"),
                "--meta-dir", str(data / "train")], cwd=tmp_path)
    assert any((ckpt.parent / "plots" / "test").rglob("Predicted.png"))

    run_script("duct_fixed_boundary/evaluate.py",
               ["--checkpoint", str(ckpt), "--save-plots", "--batch-size", "2",
                *common,
                "--data-dir", str(data / "test"),
                "--meta-dir", str(data / "train")], cwd=tmp_path)
    stats = ckpt.parent / "plots" / "test" / "stats"
    assert (stats / "Errors.csv").exists()
    import pandas
    df = pandas.read_csv(stats / "Errors.csv", index_col=0)
    assert "Pressure drop" in df.index  # experiment-specific metric appended


def test_derivative_path_flags():
    """CLI derivative-path resolution (round-4 defaults): no flags -> the
    analytic decoupled fast path; --exact-derivatives -> exact nested
    autodiff (derivative_apply None); --coupled-context -> analytic coupled,
    differing from the default exactly in the pooled-context J/H terms."""
    import argparse

    from examples.duct_fixed_boundary.train import get_model
    from porous_cfd_tpu.data.synthetic import make_scalers

    def build(**flags):
        kw = {"model": "pipn", "exact_derivatives": False,
              "coupled_context": False}
        kw.update(flags)
        return get_model(argparse.Namespace(**kw), make_scalers())

    assert build().derivative_apply is not None
    assert build(exact_derivatives=True).derivative_apply is None
    coupled = build(coupled_context=True)
    assert coupled.derivative_apply is not None

    from porous_cfd_tpu.data.synthetic import make_foam_batch
    from porous_cfd_tpu.train.engine import gather_cases
    import jax.numpy as jnp
    import jax.random as jrandom
    from flax.core import unfreeze

    batch = gather_cases(make_foam_batch(2, 24, 16, 8,
                                         rng=np.random.default_rng(3)),
                         jnp.arange(2))
    default = build()
    params = unfreeze(default.module.init(jrandom.PRNGKey(0), batch["C"],
                                          batch, True))["params"]
    out_d, jac_d, lap_d = default.derivative_apply(params, batch, None, True)
    out_c, jac_c, lap_c = coupled.derivative_apply(params, batch, None, True)
    np.testing.assert_allclose(np.asarray(out_c), np.asarray(out_d),
                               rtol=1e-5, atol=1e-5)  # values identical
    assert not np.allclose(np.asarray(jac_c), np.asarray(jac_d))  # J differs


def test_patch_rotations_disjoint_from_base_grid():
    """--patch-shapes densification draws ONLY rotation midpoints: no
    generated geometry (shape, rot, sx, sy) may coincide with any base-grid
    variant, so held-out val/test geometries can never leak into training."""
    import sys as _sys
    _sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))
    from golden_transform_grid import TRANSFORMS, rotations

    any_midpoints = False
    for shape, spec in TRANSFORMS.items():
        base = {round(float(r), 6) for r in rotations(spec, 1)}
        dense = {round(float(r), 6) for r in rotations(spec, 2)}
        midpoints = dense - base
        if len(base) > 1:  # rotationally-symmetric shapes have 1 rotation
            assert midpoints, shape
            any_midpoints = True
        assert not (midpoints & base), shape
    assert any_midpoints
