"""Trainer host-loop tests: fit, TensorBoard artifacts, checkpoint/resume
determinism (SURVEY.md section 5.3-5.5 parity)."""
import json

import numpy as np
import pytest

from porous_cfd_tpu.data.manufactured import make_manufactured_batch
from porous_cfd_tpu.models.pipn import pipn_manufactured
from porous_cfd_tpu.train.trainer import Trainer, TrainerConfig

NU, D, F = 0.01, 50.0, 1.0


def tiny_model():
    return pipn_manufactured(NU, D, F, [2, 8, 8], [8 + 3, 8, 16], [24, 8, 3])


def make_data(n_cases, seed=0):
    return make_manufactured_batch(np.random.default_rng(seed), n_cases, 24, 8)


def test_fit_writes_artifacts(tmp_path):
    model = tiny_model()
    trainer = Trainer(model, make_data(5), make_data(2, seed=1),
                      TrainerConfig(epochs=4, batch_size=2,
                                    logs_dir=str(tmp_path), name="exp",
                                    checkpoint_every=2),
                      model_type="pipn")
    trainer.write_model_meta(24, 8, 0)
    state = trainer.fit()

    log_dir = tmp_path / "lightning_logs" / "exp"
    with open(log_dir / "model_meta.json") as f:
        meta = json.load(f)
    assert meta["Model type"] == "pipn"
    assert (log_dir / "model.ckpt").exists()
    assert (log_dir / "best.ckpt").exists()  # best-validation weights
    assert (log_dir / "checkpoint-epoch=2.ckpt").exists()
    assert (log_dir / "checkpoint-epoch=4.ckpt").exists()
    assert list(log_dir.glob("events.out.tfevents.*"))  # tensorboard
    assert int(state.step) == 4 * trainer.steps_per_epoch


def test_remainder_batch_included(tmp_path):
    model = tiny_model()
    trainer = Trainer(model, make_data(5), None,
                      TrainerConfig(epochs=1, batch_size=2,
                                    logs_dir=str(tmp_path), name="r"),
                      model_type="pipn")
    assert trainer.full_steps == 2 and trainer.remainder == 1
    state = trainer.fit()
    assert int(state.step) == 3  # 2 full + 1 remainder step


def test_resume_matches_uninterrupted(tmp_path):
    model = tiny_model()
    data, val = make_data(4), None

    t_full = Trainer(model, data, val,
                     TrainerConfig(epochs=6, batch_size=2,
                                   logs_dir=str(tmp_path / "full"), name="x",
                                   checkpoint_every=3), model_type="pipn")
    s_full = t_full.fit()

    t_a = Trainer(model, data, val,
                  TrainerConfig(epochs=6, batch_size=2,
                                logs_dir=str(tmp_path / "ab"), name="x",
                                checkpoint_every=3), model_type="pipn")
    # emulate interruption at epoch 3 by training only 3 epochs
    t_a.config.epochs = 3
    t_a.fit()
    t_a.config.epochs = 6
    ckpt = tmp_path / "ab" / "lightning_logs" / "x" / "checkpoint-epoch=3.ckpt"
    s_resumed = t_a.fit(resume_from=str(ckpt))

    import jax
    for a, b in zip(jax.tree_util.tree_leaves(s_full.params),
                    jax.tree_util.tree_leaves(s_resumed.params)):
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=1e-6)


def test_resume_determinism_note():
    """Same seed => bit-identical first-epoch metrics across Trainer runs."""
    model = tiny_model()
    runs = []
    for _ in range(2):
        import tempfile
        with tempfile.TemporaryDirectory() as td:
            t = Trainer(model, make_data(4), None,
                        TrainerConfig(epochs=1, batch_size=2, logs_dir=td,
                                      name="d"), model_type="pipn")
            s = t.fit()
            runs.append(np.asarray(s.params["decoder"]["linear_0"]["kernel"]))
    np.testing.assert_array_equal(runs[0], runs[1])


def test_chunked_epochs_match_per_epoch(tmp_path):
    """log_every > 1 runs epochs in one device program (engine.train_epochs);
    the final state must be bit-identical to the per-epoch loop (same shuffle
    stream, same step math), and every epoch's scalars must still be logged."""
    import jax

    data = make_data(4)
    states = {}
    for name, log_every in [("per-epoch", 1), ("chunked", 3)]:
        model = tiny_model()
        trainer = Trainer(model, data, None,
                          TrainerConfig(epochs=6, batch_size=2,
                                        logs_dir=str(tmp_path), name=name,
                                        log_every=log_every,
                                        checkpoint_every=3),
                          model_type="pipn")
        states[name] = trainer.fit()
        assert (tmp_path / "lightning_logs" / name
                / "checkpoint-epoch=3.ckpt").exists()

    flat_a = jax.tree_util.tree_leaves(states["per-epoch"].params)
    flat_b = jax.tree_util.tree_leaves(states["chunked"].params)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(states["chunked"].step) == int(states["per-epoch"].step)


def test_resample_refreshes_dataset_and_resume_matches(tmp_path):
    """resample_every swaps in fresh point subsamples at deterministic epoch
    boundaries; resume across a boundary replays the same sample sequence."""
    model = tiny_model()
    calls = []

    def resample_fn(round_idx):
        calls.append(round_idx)
        return make_data(4, seed=1000 + round_idx)

    cfg = dict(batch_size=2, checkpoint_every=2, resample_every=2)
    t_full = Trainer(model, make_data(4), None,
                     TrainerConfig(epochs=6, logs_dir=str(tmp_path / "f"),
                                   name="x", **cfg),
                     model_type="pipn", resample_fn=resample_fn)
    s_full = t_full.fit()
    assert calls == [1, 2]  # rounds at epochs 2 and 4 (round 0 = initial)

    calls.clear()
    t_ab = Trainer(model, make_data(4), None,
                   TrainerConfig(epochs=6, logs_dir=str(tmp_path / "ab"),
                                 name="x", **cfg),
                   model_type="pipn", resample_fn=resample_fn)
    t_ab.config.epochs = 4
    t_ab.fit()
    t_ab.config.epochs = 6
    ckpt = tmp_path / "ab" / "lightning_logs" / "x" / "checkpoint-epoch=4.ckpt"
    s_res = t_ab.fit(resume_from=str(ckpt))
    assert calls[-1] == 2  # resumed run re-applies round 2 for epochs 4-6

    import jax
    for a, b in zip(jax.tree_util.tree_leaves(s_full.params),
                    jax.tree_util.tree_leaves(s_res.params)):
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=1e-6)
