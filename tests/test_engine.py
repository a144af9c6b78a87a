"""End-to-end training engine tests on the manufactured-solutions workload,
including determinism and multi-device (8 fake CPU chips) sharding."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from porous_cfd_tpu.data.foam_data import FoamData
from porous_cfd_tpu.data.manufactured import make_manufactured_batch
from porous_cfd_tpu.models.pipn import pipn_manufactured
from porous_cfd_tpu.physics.scaling import FixedLossScaler, RelobraloScaler
from porous_cfd_tpu.train.engine import (gather_cases, init_train_state,
                                         make_optimizer, make_train_functions)

NU, D, F = 0.01, 50.0, 1.0


def tiny_model():
    return pipn_manufactured(
        NU, D, F,
        fe_local_layers=[2, 16, 16],
        fe_global_layers=[16 + 3, 16, 32],
        seg_layers=[32 + 16, 32, 3])


def make_dataset(n_cases=8, n_internal=48, n_boundary=16, seed=0):
    rng = np.random.default_rng(seed)
    return make_manufactured_batch(rng, n_cases, n_internal, n_boundary, NU, D, F)


def test_train_step_runs_and_loss_decreases():
    model = tiny_model()
    dataset = make_dataset()
    tx = make_optimizer(model, steps_per_epoch=2)
    fns = make_train_functions(model, tx)
    batch = gather_cases(dataset, jnp.arange(4))
    state = init_train_state(model, tx, batch)

    first = None
    for i in range(30):
        state, metrics = fns.train_step(state, batch)
        if first is None:
            first = float(metrics[0])
    assert np.isfinite(float(metrics[0]))
    assert float(metrics[0]) < first
    assert len(fns.metric_labels) == len(metrics)
    assert fns.metric_labels[0] == "Total loss"


def test_epoch_scan_equivalent_to_steps():
    model = tiny_model()
    dataset = make_dataset()
    tx = make_optimizer(model, steps_per_epoch=2)
    fns = make_train_functions(model, tx)
    perm = jnp.arange(8).reshape(2, 4)
    batch0 = gather_cases(dataset, perm[0])

    state_a = init_train_state(model, tx, batch0)
    state_b = init_train_state(model, tx, batch0)

    state_a, m_epoch = fns.train_epoch(state_a, dataset, perm)
    ms = []
    for i in range(2):
        state_b, m = fns.train_step(state_b, gather_cases(dataset, perm[i]))
        ms.append(m)
    np.testing.assert_allclose(m_epoch, np.mean(ms, axis=0), rtol=2e-4, atol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(state_a.params),
                    jax.tree_util.tree_leaves(state_b.params)):
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=1e-6)


def test_determinism_same_seed_same_metrics():
    model = tiny_model()
    dataset = make_dataset()
    tx = make_optimizer(model, steps_per_epoch=2)
    fns = make_train_functions(model, tx)
    perm = jnp.arange(8).reshape(2, 4)
    batch0 = gather_cases(dataset, perm[0])

    runs = []
    for _ in range(2):
        state = init_train_state(model, tx, batch0, seed=8421)
        state, m = fns.train_epoch(state, dataset, perm)
        runs.append(np.asarray(m))
    np.testing.assert_array_equal(runs[0], runs[1])


def test_eval_and_predict():
    model = tiny_model()
    dataset = make_dataset()
    tx = make_optimizer(model, steps_per_epoch=2)
    fns = make_train_functions(model, tx)
    batch = gather_cases(dataset, jnp.arange(4))
    state = init_train_state(model, tx, batch)

    errs = fns.eval_batch(state.params, batch)
    assert errs.shape == (3,)  # [p, ux, uy]
    pred = fns.predict_batch(state.params, batch, False)
    assert pred.data.shape == (4, 64, 3)
    assert "U" in pred and "p" in pred

    pred, extras = fns.predict_batch(state.params, batch, True)
    assert extras.data.shape == (4, 48, 3)  # [Momx, Momy, div] on internal
    assert "Momentum" in extras and "div" in extras


def test_fixed_loss_scaler_weights_losses():
    model = tiny_model()
    dataset = make_dataset()
    tx = make_optimizer(model, steps_per_epoch=1)
    scaler = FixedLossScaler.from_dict(
        {"continuity": [2.0], "momentum": [1.0, 1.0], "boundary": [1.0] * 3})
    fns_w = make_train_functions(model, tx, loss_scaler=scaler)
    fns_u = make_train_functions(model, tx)
    batch = gather_cases(dataset, jnp.arange(4))
    state = init_train_state(model, tx, batch)
    _, m_w = fns_w.train_step(state, batch)
    state = init_train_state(model, tx, batch)
    _, m_u = fns_u.train_step(state, batch)
    # continuity loss doubled, momentum/boundary identical
    np.testing.assert_allclose(m_w[1], 2 * m_u[1], rtol=1e-5)
    np.testing.assert_allclose(m_w[2:7], m_u[2:7], rtol=1e-5)


def test_relobralo_scaler_updates_state():
    model = tiny_model()
    dataset = make_dataset()
    tx = make_optimizer(model, steps_per_epoch=2)
    scaler = RelobraloScaler(num_losses=model.num_losses, alpha=0.005,
                             update_period=2)
    fns = make_train_functions(model, tx, loss_scaler=scaler)
    batch = gather_cases(dataset, jnp.arange(4))
    state = init_train_state(model, tx, batch, loss_scaler=scaler)

    assert state.scaler_state is not None
    lam0 = np.asarray(state.scaler_state.lambda_ema)
    for _ in range(5):
        state, m = fns.train_step(state, batch)
    lam = np.asarray(state.scaler_state.lambda_ema)
    assert np.isfinite(lam).all()
    assert not np.array_equal(lam0, lam)
    assert np.isfinite(float(m[0]))


@pytest.mark.parametrize("shard_points", [False, True])
def test_multichip_data_parallel(shard_points):
    """Full train step jitted over an 8-device mesh; XLA inserts the psum."""
    from jax.sharding import Mesh
    devs = np.array(jax.devices()[:8])
    if shard_points:
        mesh = Mesh(devs.reshape(4, 2), ("data", "points"))
    else:
        mesh = Mesh(devs.reshape(8, 1), ("data", "points"))

    model = tiny_model()
    dataset = make_dataset(n_cases=8)
    tx = make_optimizer(model, steps_per_epoch=1)
    fns = make_train_functions(model, tx, mesh=mesh, shard_points=shard_points)
    batch = gather_cases(dataset, jnp.arange(8))
    state = init_train_state(model, tx, batch)
    state, metrics = fns.train_step(state, batch)
    assert np.isfinite(float(metrics[0]))

    # sharded result matches single-device result
    fns1 = make_train_functions(model, tx)
    state1 = init_train_state(model, tx, batch)
    _, metrics1 = fns1.train_step(state1, batch)
    np.testing.assert_allclose(metrics, metrics1, rtol=5e-3, atol=1e-5)
