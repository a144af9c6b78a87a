"""Example-experiment tests: the manufactured_solutions experiment end-to-end
through its CLI scripts (generate -> train -> inference -> evaluate), plus zoo
construction for every experiment."""
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parents[1]


def run_script(script, args, cwd):
    env_cmd = [sys.executable, str(REPO / "examples" / script)] + args
    proc = subprocess.run(
        env_cmd, cwd=cwd, capture_output=True, text=True, timeout=900,
        env={"PYTHONPATH": str(REPO), "PATH": "/usr/bin:/bin:/usr/local/bin",
             "JAX_PLATFORMS": "cpu", "HOME": str(cwd)})
    assert proc.returncode == 0, f"{script} failed:\n{proc.stderr[-3000:]}"
    return proc


@pytest.mark.slow
def test_manufactured_cli_end_to_end(tmp_path):
    # generate a tiny dataset
    from porous_cfd_tpu.datagen import synthetic_case
    from porous_cfd_tpu.datagen.meta import generate_meta, generate_min_points
    rng = np.random.default_rng(8421)
    data = tmp_path / "data"
    for split, n in [("train", 3), ("val", 2), ("test", 2)]:
        synthetic_case.write_manufactured_split(data / split, n, rng,
                                                n_internal=120, n_per_patch=24)
        synthetic_case.write_data_config(
            data / split, fields=["C", "cellToRegion"],
            variable_boundaries={}, normalize={"Scale": [], "Standardize": []},
            dims=["x", "y"])
        generate_meta(data / split, "C", "cellToRegion", max_dim=2)
    generate_min_points(data)

    common = ["--n-internal", "60", "--n-boundary", "24",
              "--n-observations", "0"]
    run_script("manufactured_solutions/train.py",
               ["--model", "pipn", "--name", "t", "--epochs", "2",
                "--batch-size", "2", *common,
                "--train-dir", str(data / "train"),
                "--val-dir", str(data / "val"),
                "--logs-dir", str(tmp_path)], cwd=tmp_path)
    ckpt = tmp_path / "lightning_logs" / "t" / "model.ckpt"
    assert ckpt.exists()

    run_script("manufactured_solutions/inference.py",
               ["--checkpoint", str(ckpt), "--save-plots", *common,
                "--data-dir", str(data / "test"),
                "--meta-dir", str(data / "train")], cwd=tmp_path)
    plots = ckpt.parent / "plots" / "test"
    assert any(plots.rglob("*.png"))

    run_script("manufactured_solutions/evaluate.py",
               ["--checkpoint", str(ckpt), "--save-plots", *common,
                "--batch-size", "2",
                "--data-dir", str(data / "test"),
                "--meta-dir", str(data / "train")], cwd=tmp_path)
    assert (ckpt.parent / "plots" / "test" / "stats" / "Errors.csv").exists()
