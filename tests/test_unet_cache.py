"""U-Net (full-variant) neighbor cache: attach_neighbors precomputes SA chains
+ FP kNN indices over all points; outputs must be bit-identical with/without."""
import jax
import jax.numpy as jnp
import numpy as np

from porous_cfd_tpu.data.synthetic import (VARIABLE_BOUNDARIES,
                                           make_foam_batch, make_scalers)
from porous_cfd_tpu.models import pi_gano as pg
from porous_cfd_tpu.models import pipn
from porous_cfd_tpu.train.engine import make_optimizer, make_train_functions


def unet_model():
    return pipn.pipn_foam_pp_full(
        1489.4e-6, 14000.0, 17.11,
        enc_layers=[[2 * 2 + 1 + 4, 16, 16, 24],
                    [24 + 2, 24, 24, 32],
                    [32 + 2, 48]],
        enc_radius=[0.4, 0.8],
        enc_fraction=[0.5, 0.25],
        dec_layers=[[48 + 32, 32, 32],
                    [24 + 32, 24, 24],
                    [24 + 4 + 2 + 1, 24, 24, 3]],
        dec_k=[3, 3, 3],
        scalers=make_scalers())


def test_unet_cache_bit_identical():
    batch = make_foam_batch(2, 32, 16, 8, seed=12)
    model = unet_model()
    assert model.neighbor_precompute is not None
    cached = model.attach_neighbors(batch)
    assert "fp_idx_0" in cached.domain and "sa_idx_1" in cached.domain

    pts = jnp.concatenate([batch["internal"]["C"], batch["boundary"]["C"]], -2)
    params = model.module.init({"params": jax.random.PRNGKey(0)}, pts, batch,
                               deterministic=True)["params"]
    y_a = model.module.apply({"params": params}, pts, batch,
                             deterministic=True)
    y_b = model.module.apply({"params": params}, pts, cached,
                             deterministic=True)
    np.testing.assert_array_equal(np.asarray(y_a), np.asarray(y_b))


def test_unet_cache_training_step():
    batch = make_foam_batch(2, 32, 16, 8, seed=13)
    model = unet_model()
    cached = model.attach_neighbors(batch)
    tx = make_optimizer(model, 1)
    fns = make_train_functions(model, tx)
    state = fns.init_state(cached)
    for _ in range(3):
        state, m = fns.train_step(state, cached)
    assert np.isfinite(float(m[0]))


def test_pi_gano_pp_full_cache():
    batch = make_foam_batch(2, 32, 16, 8, seed=14)
    model = pg.pi_gano_pp_full(
        1489.4e-6, 3,
        branch_layers=[8, 16, 24],
        enc_layers=[[2 * 2 + 4 + 1, 16, 16, 24],
                    [24 + 2, 24, 24, 32],
                    [32 + 2, 48]],
        enc_radius=[0.5, 1.0],
        enc_fraction=[0.5, 0.25],
        dec_layers=[[48 + 32, 32, 32],
                    [24 + 32, 24, 24],
                    [24 + 2 + 4 + 1, 24, 24, 3]],
        dec_k=[3, 3, 3],
        fp_dropout=[0.0, 0.0, [0.0, 0.2, 0.0]],
        scalers=make_scalers(),
        variable_boundaries=VARIABLE_BOUNDARIES)
    cached = model.attach_neighbors(batch)
    pts = jnp.concatenate([batch["internal"]["C"], batch["boundary"]["C"]], -2)
    params = model.module.init({"params": jax.random.PRNGKey(0)}, pts, batch,
                               deterministic=True)["params"]
    y_a = model.module.apply({"params": params}, pts, batch,
                             deterministic=True)
    y_b = model.module.apply({"params": params}, pts, cached,
                             deterministic=True)
    np.testing.assert_array_equal(np.asarray(y_a), np.asarray(y_b))


def test_mrg_cache_bit_identical():
    """MRG grouping cache: one 2-level boundary chain serves branch1 (both
    levels) and branch2 (same deterministic (0.5, 0.5) grouping as level 0);
    outputs must be bit-identical and both derivative paths unchanged."""
    batch = make_foam_batch(2, 32, 16, 8, seed=15)
    model = pipn.pipn_foam_pp_mrg(
        n_dims=2, mrg_in_features=4 + 2,
        nu=1489.4e-6, d=14000.0, f=17.11,
        fe_local_layers=[2, 16, 16],
        seg_layers=[1024 + 16, 16, 3],
        scalers=make_scalers())
    assert model.neighbor_precompute is not None
    cached = model.attach_neighbors(batch)
    assert "sa_idx_1" in cached.domain and "fp_idx_0" not in cached.domain

    pts = jnp.concatenate([batch["internal"]["C"], batch["boundary"]["C"]], -2)
    params = model.module.init({"params": jax.random.PRNGKey(0)}, pts, batch,
                               deterministic=True)["params"]
    y_a = model.module.apply({"params": params}, pts, batch,
                             deterministic=True)
    y_b = model.module.apply({"params": params}, pts, cached,
                             deterministic=True)
    np.testing.assert_array_equal(np.asarray(y_a), np.asarray(y_b))
    # analytic fast path sees the cache too
    o_a, j_a, l_a = model.derivative_apply(params, batch)
    o_b, j_b, l_b = model.derivative_apply(params, cached)
    np.testing.assert_array_equal(np.asarray(o_a), np.asarray(o_b))
    np.testing.assert_array_equal(np.asarray(j_a), np.asarray(j_b))
    np.testing.assert_array_equal(np.asarray(l_a), np.asarray(l_b))


def test_mrg_cache_training_step():
    batch = make_foam_batch(2, 32, 16, 8, seed=16)
    model = pipn.pipn_foam_pp_mrg(
        n_dims=2, mrg_in_features=4 + 2,
        nu=1489.4e-6, d=14000.0, f=17.11,
        fe_local_layers=[2, 16, 16],
        seg_layers=[1024 + 16, 16, 3],
        scalers=make_scalers())
    cached = model.attach_neighbors(batch)
    tx = make_optimizer(model, 1)
    fns = make_train_functions(model, tx)
    state = fns.init_state(cached)
    for _ in range(3):
        state, m = fns.train_step(state, cached)
    assert np.isfinite(float(m[0]))
