"""duct_variable_boundary CLI e2e (PI-GANO, variable U-inlet + d/f) and the
vertical-duct merged-inlet dataset."""
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parents[1]
FIELDS = ["C", "U", "p", "cellToRegion", "d", "f"]


def run_script(script, args, cwd):
    proc = subprocess.run(
        [sys.executable, str(REPO / "examples" / script)] + args,
        cwd=cwd, capture_output=True, text=True, timeout=900,
        env={"PYTHONPATH": str(REPO), "PATH": "/usr/bin:/bin:/usr/local/bin",
             "JAX_PLATFORMS": "cpu", "HOME": str(cwd)})
    assert proc.returncode == 0, f"{script} failed:\n{proc.stderr[-3000:]}"
    return proc


@pytest.mark.slow
def test_duct_variable_cli_train_evaluate(tmp_path):
    from porous_cfd_tpu.datagen import synthetic_case
    from porous_cfd_tpu.datagen.meta import generate_meta, generate_min_points
    rng = np.random.default_rng(8421)
    data = tmp_path / "data"
    for split, n in [("train", 3), ("val", 2), ("test", 2)]:
        synthetic_case.write_foam_split(data / split, n, rng, n_internal=160,
                                        n_per_patch=24, variable=True)
        synthetic_case.write_data_config(
            data / split, fields=FIELDS, variable_boundaries={"U": "inlet"},
            normalize={"Scale": ["d", "f"], "Standardize": ["C", "U", "p"]},
            dims=["x", "y"])
        generate_meta(data / split, *FIELDS, max_dim=2)
    generate_min_points(data)

    common = ["--n-internal", "80", "--n-boundary", "40",
              "--n-observations", "20"]
    run_script("duct_variable_boundary/train.py",
               ["--model", "pi-gano", "--name", "v", "--epochs", "2",
                "--batch-size", "2", *common,
                "--train-dir", str(data / "train"),
                "--val-dir", str(data / "val"),
                "--logs-dir", str(tmp_path)], cwd=tmp_path)
    ckpt = tmp_path / "lightning_logs" / "v" / "model.ckpt"
    assert ckpt.exists()

    run_script("duct_variable_boundary/evaluate.py",
               ["--checkpoint", str(ckpt), "--save-plots", "--batch-size", "2",
                *common,
                "--data-dir", str(data / "test"),
                "--meta-dir", str(data / "train")], cwd=tmp_path)
    stats = ckpt.parent / "plots" / "test" / "stats"
    assert (stats / "Errors.csv").exists()
    assert (stats / "MAE heatmap.png").exists()
    assert (stats / "MAE by inlet angle.png").exists()


def test_vertical_duct_dataset_merges_inlets(tmp_path):
    """VerticalDuctDataset folds the inlet-top one-hot into inlet."""
    import sys as _sys
    _sys.path.insert(0, str(REPO / "examples" / "vertical_duct_fixed_boundary"))
    from vertical_duct_dataset import VerticalDuctDataset

    from porous_cfd_tpu.datagen import synthetic_case
    from porous_cfd_tpu.datagen.meta import generate_meta, generate_min_points
    rng = np.random.default_rng(0)
    data = tmp_path / "data"
    patches = ["inlet", "inlet-top", "interface", "outlet", "walls"]
    for split, n in [("train", 2)]:
        synthetic_case.write_foam_split(data / split, n, rng, n_internal=120,
                                        n_per_patch=20, patch_names=patches)
        synthetic_case.write_data_config(
            data / split, fields=["C", "U", "p", "cellToRegion"],
            variable_boundaries={},
            normalize={"Scale": [], "Standardize": ["C", "U", "p"]},
            dims=["x", "y"])
        generate_meta(data / split, "C", "U", "p", "cellToRegion", max_dim=2)
    generate_min_points(data)

    ds = VerticalDuctDataset(str(data / "train"), 60, 50, 10,
                             np.random.default_rng(1))
    case = ds[0]
    labels = dict(case.labels)
    assert "boundaryIdinlet-top" not in labels
    assert labels["boundaryId"] == ("boundaryIdinlet", "boundaryIdinterface",
                                    "boundaryIdoutlet", "boundaryIdwalls")
    # rows of the inlet-top patch now carry the inlet one-hot
    bid = np.asarray(case["boundaryId"])
    top_rows = np.asarray(case.domain["inlet-top"])
    assert np.all(bid[top_rows, 0] == 1.0)
