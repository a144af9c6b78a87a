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
