"""3D experiment coverage: abc (PIPN 3D, Ux-inlet variable column) and
windbreaks (PI-GANO 3D, solid house patch) end-to-end on synthetic data."""
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parents[1]
FIELDS = ["C", "U", "p", "cellToRegion", "d", "f"]


def make_3d_root(tmp_path, patch_names, variable_boundaries):
    from porous_cfd_tpu.datagen import synthetic_case
    from porous_cfd_tpu.datagen.meta import generate_meta, generate_min_points
    rng = np.random.default_rng(8421)
    data = tmp_path / "data"
    for split, n in [("train", 3), ("val", 2), ("test", 2)]:
        synthetic_case.write_foam_split(
            data / split, n, rng, n_internal=160, n_per_patch=24, dims=3,
            d=30000.0, f=79.731, variable=True, patch_names=patch_names)
        synthetic_case.write_data_config(
            data / split, fields=FIELDS,
            variable_boundaries=variable_boundaries,
            normalize={"Scale": ["d", "f"], "Standardize": ["C", "U", "p"]},
            dims=["x", "y", "z"])
        generate_meta(data / split, *FIELDS, max_dim=3)
    generate_min_points(data)
    return data


def run_script(script, args, cwd):
    proc = subprocess.run(
        [sys.executable, str(REPO / "examples" / script)] + args,
        cwd=cwd, capture_output=True, text=True, timeout=900,
        env={"PYTHONPATH": str(REPO), "PATH": "/usr/bin:/bin:/usr/local/bin",
             "JAX_PLATFORMS": "cpu", "HOME": str(cwd)})
    assert proc.returncode == 0, f"{script} failed:\n{proc.stderr[-3000:]}"
    return proc


@pytest.mark.slow
def test_abc_cli_train_evaluate(tmp_path):
    data = make_3d_root(tmp_path, None, {"Ux": "inlet"})
    common = ["--n-internal", "80", "--n-boundary", "40",
              "--n-observations", "20"]
    run_script("abc/train.py",
               ["--model", "pipn", "--name", "a", "--epochs", "2",
                "--batch-size", "2", *common,
                "--train-dir", str(data / "train"),
                "--val-dir", str(data / "val"),
                "--logs-dir", str(tmp_path)], cwd=tmp_path)
    ckpt = tmp_path / "lightning_logs" / "a" / "model.ckpt"
    assert ckpt.exists()

    run_script("abc/evaluate.py",
               ["--checkpoint", str(ckpt), "--save-plots", "--batch-size", "2",
                *common,
                "--data-dir", str(data / "test"),
                "--meta-dir", str(data / "train")], cwd=tmp_path)
    stats = ckpt.parent / "plots" / "test" / "stats"
    assert (stats / "Errors.csv").exists()
    assert (stats / "MAE by inlet speed.png").exists()


@pytest.mark.slow
def test_windbreaks_cli_train_evaluate(tmp_path):
    data = make_3d_root(
        tmp_path, ["inlet", "interface", "outlet", "solid", "walls"],
        {"Ux": "inlet"})
    common = ["--n-internal", "80", "--n-boundary", "50",
              "--n-observations", "20"]
    run_script("windbreaks/train.py",
               ["--model", "pi-gano", "--name", "w", "--epochs", "2",
                "--batch-size", "2", *common,
                "--train-dir", str(data / "train"),
                "--val-dir", str(data / "val"),
                "--logs-dir", str(tmp_path)], cwd=tmp_path)
    ckpt = tmp_path / "lightning_logs" / "w" / "model.ckpt"
    assert ckpt.exists()

    run_script("windbreaks/evaluate.py",
               ["--checkpoint", str(ckpt), "--save-plots", "--batch-size", "2",
                *common,
                "--data-dir", str(data / "test"),
                "--meta-dir", str(data / "train")], cwd=tmp_path)
    stats = ckpt.parent / "plots" / "test" / "stats"
    assert (stats / "Errors.csv").exists()
    assert (stats / "Solid Average relative error.png").exists()
