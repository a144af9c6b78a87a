"""End-to-end pipeline tests on a synthetic on-disk OpenFOAM dataset:
train -> inference (plots) -> evaluate (Errors.csv) -> compare (Test.csv)."""
from argparse import Namespace

import numpy as np
import pytest

from porous_cfd_tpu.data.dataset import FoamDataset
from porous_cfd_tpu.datagen import synthetic_case
from porous_cfd_tpu.datagen.meta import generate_meta, generate_min_points
from porous_cfd_tpu.models.pipn import pipn_foam
from porous_cfd_tpu.pipelines import compare as cmp
from porous_cfd_tpu.pipelines import evaluation, inference, training
from porous_cfd_tpu.train.trainer import load_checkpoint

FIELDS = ["C", "U", "p", "cellToRegion", "d", "f"]


@pytest.fixture(scope="module")
def foam_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("pipe")
    rng = np.random.default_rng(8421)
    for split, n in [("train", 4), ("test", 3)]:
        synthetic_case.write_foam_split(root / split, n, rng, n_internal=200,
                                        n_per_patch=30)
        synthetic_case.write_data_config(
            root / split, fields=FIELDS, variable_boundaries={},
            normalize={"Scale": ["d", "f"], "Standardize": ["C", "U", "p"]},
            dims=["x", "y"])
        generate_meta(root / split, *FIELDS, max_dim=2)
    generate_min_points(root)
    return root


def tiny_foam_model(scalers):
    return pipn_foam(1489.4e-6, 14000.0, 17.11,
                     fe_local_layers=[2, 16, 16],
                     fe_global_layers=[16 + 1 + 4, 16, 32],
                     seg_layers=[32 + 16, 16, 3],
                     scalers=scalers)


@pytest.fixture(scope="module")
def trained(foam_root, tmp_path_factory):
    logs = tmp_path_factory.mktemp("logs")
    rng = np.random.default_rng(8421)
    train_ds = FoamDataset(str(foam_root / "train"), 80, 40, 20, rng)
    model = tiny_foam_model(train_ds.normalizers)
    args = Namespace(epochs=3, batch_size=2, logs_dir=str(logs), name="pipn-a",
                     checkpoint=None, model="pipn", n_internal=80,
                     n_boundary=40, n_observations=20, precision="32")
    training.train(args, model, train_ds, None)
    ckpt = logs / "lightning_logs" / "pipn-a" / "model.ckpt"
    assert ckpt.exists()
    return foam_root, logs, model, ckpt, train_ds


def test_inference_pipeline(trained):
    foam_root, logs, model, ckpt, train_ds = trained
    rng = np.random.default_rng(1)
    test_ds = FoamDataset(str(foam_root / "test"), 80, 40, 20, rng,
                          meta_dir=str(foam_root / "train"))
    state, _ = load_checkpoint(str(ckpt), model, test_ds.stacked())

    calls = []

    def process(data, target, predicted, case_path, plot_path):
        calls.append((case_path.name, predicted.data.shape))
        assert "U" in predicted and "p" in predicted

    args = Namespace(save_plots=False, checkpoint=str(ckpt),
                     data_dir=str(foam_root / "test"))
    preds = inference.predict(args, model, state.params, test_ds, process)
    assert len(preds) == 3 and len(calls) == 3
    assert calls[0][1] == (120, 3)


def test_evaluation_pipeline(trained, tmp_path):
    foam_root, logs, model, ckpt, train_ds = trained
    rng = np.random.default_rng(2)
    test_ds = FoamDataset(str(foam_root / "test"), 80, 40, 20, rng,
                          meta_dir=str(foam_root / "train"))
    state, _ = load_checkpoint(str(ckpt), model, test_ds.stacked())

    args = Namespace(save_plots=True, checkpoint=str(ckpt),
                     data_dir=str(foam_root / "test"), batch_size=2)
    results = evaluation.evaluate(args, model, state.params, test_ds,
                                  enable_timing=True)
    assert results["U error"].shape == (3, 120, 2)
    stats_dir = ckpt.parent / "plots" / "test" / "stats"
    assert (stats_dir / "Errors.csv").exists()
    import pandas
    df = pandas.read_csv(stats_dir / "Errors.csv", index_col=0)
    for row in ["Average max errors", "Top 20", "MAE", "Fluid MAE",
                "Porous MAE", "Residuals"]:
        assert row in df.index
    assert (stats_dir / "Average relative error.png").exists()
    assert (stats_dir / "Total simulation time [s].png").exists()


def test_compare_pipeline(trained):
    foam_root, logs, model, ckpt, train_ds = trained
    rng = np.random.default_rng(3)
    test_ds = FoamDataset(str(foam_root / "test"), 80, 40, 20, rng,
                          meta_dir=str(foam_root / "train"))
    # second model: independently initialized (different seed via fresh train)
    model2 = tiny_foam_model(train_ds.normalizers)
    args2 = Namespace(epochs=1, batch_size=2, logs_dir=str(logs), name="pipn-b",
                      checkpoint=None, model="pipn", n_internal=80,
                      n_boundary=40, n_observations=20, precision="32")
    training.train(args2, model2, train_ds, None)
    ckpt2 = logs / "lightning_logs" / "pipn-b" / "model.ckpt"

    s1, _ = load_checkpoint(str(ckpt), model, test_ds.stacked())
    s2, _ = load_checkpoint(str(ckpt2), model2, test_ds.stacked())

    args = Namespace(save_plots=True, checkpoint=str(ckpt),
                     checkpoint_other=str(ckpt2),
                     data_dir=str(foam_root / "test"), batch_size=2)
    df = cmp.compare(args, model, s1.params, model2, s2.params, test_ds)
    assert set(df.columns) == {"Kruskal-Wallis", "Mann-Whitney U", "ANOVA"}
    assert np.isfinite(df.values.astype(float)).all()
    comp_dir = (ckpt.parent.parent / "comparisons" / "Pipn a vs Pipn b" / "test")
    assert (comp_dir / "Test.csv").exists()
    assert (comp_dir / "Shapiro.csv").exists()


def test_evaluation_timing_uses_trusted_sync():
    """Timing must sync via a device->host transfer (utils.profiling.sync);
    jax.block_until_ready returns early on tunneled backends (BASELINE.md)."""
    import inspect

    from porous_cfd_tpu.pipelines import evaluation

    src = inspect.getsource(evaluation)
    assert "jax.block_until_ready(" not in src
    assert "profiling.sync" in src
