"""CLI-level multi-device training: a user command line with --mesh-data
drives data-parallel training through the real experiment entry point on the
8-device CPU mesh (VERDICT r2: multi-chip must be a product feature, not just
a library; SURVEY.md section 5.8)."""
import sys

import numpy as np
import pytest

from porous_cfd_tpu.datagen import synthetic_case
from porous_cfd_tpu.datagen.meta import generate_meta, generate_min_points

FIELDS = ["C", "U", "p", "cellToRegion"]


@pytest.fixture(scope="module")
def duct_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("cli_dp")
    rng = np.random.default_rng(8421)
    for split, n in [("train", 8), ("val", 4)]:
        synthetic_case.write_foam_split(root / split, n, rng, n_internal=200,
                                        n_per_patch=30)
        synthetic_case.write_data_config(
            root / split, fields=FIELDS, variable_boundaries={},
            normalize={"Scale": [], "Standardize": ["C", "U", "p"]},
            dims=["x", "y"])
        generate_meta(root / split, *FIELDS, max_dim=2)
    generate_min_points(root)
    return root


def test_cli_mesh_data_flag_trains(duct_root, tmp_path, monkeypatch):
    import jax
    assert len(jax.devices()) == 8, "conftest must provide the fake mesh"

    from examples.duct_fixed_boundary import train as duct_train

    monkeypatch.setattr(sys, "argv", [
        "train.py", "--model", "pipn", "--name", "dp4", "--epochs", "2",
        "--train-dir", str(duct_root / "train"),
        "--val-dir", str(duct_root / "val"),
        "--n-internal", "80", "--n-boundary", "40", "--n-observations", "20",
        "--batch-size", "4", "--precision", "32",
        "--logs-dir", str(tmp_path), "--mesh-data", "4",
        "--fast-derivatives",
    ])
    duct_train.run()
    assert (tmp_path / "lightning_logs" / "dp4" / "model.ckpt").exists()


def test_mesh_from_args():
    from argparse import Namespace

    from porous_cfd_tpu.pipelines.training import mesh_from_args

    mesh, sp = mesh_from_args(Namespace(mesh_data=0, mesh_points=1))
    assert mesh is None and not sp

    mesh, sp = mesh_from_args(Namespace(mesh_data=4, mesh_points=2))
    assert mesh.devices.shape == (4, 2) and sp

    mesh, sp = mesh_from_args(Namespace(mesh_data=-1, mesh_points=2))
    assert mesh.devices.shape == (4, 2) and sp

    # mesh_data=0 means "single device" per the flag help: --mesh-points
    # alone must NOT auto-fill the data axis (ADVICE r3)
    mesh, sp = mesh_from_args(Namespace(mesh_data=0, mesh_points=2))
    assert mesh.devices.shape == (1, 2) and sp
