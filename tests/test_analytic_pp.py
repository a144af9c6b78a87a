"""Fast-path exactness for the ++ families: PIPN++ / PIPN++-MRG / PI-GANO++
pool their geometry embedding over BOUNDARY points only, which are never
differentiated — so the analytic path must match exact autodiff everywhere."""
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from porous_cfd_tpu.data.synthetic import (VARIABLE_BOUNDARIES,
                                           make_foam_batch, make_scalers)
from porous_cfd_tpu.models import pi_gano as pg
from porous_cfd_tpu.models import pipn
from porous_cfd_tpu.physics.operators import pinn_derivatives
from porous_cfd_tpu.train.engine import make_optimizer, make_train_functions


def check_exact(model, batch, atol_jac=1e-4, atol_lap=1e-3):
    module = model.module
    pts = jnp.concatenate([batch["internal"]["C"], batch["boundary"]["C"]], -2)
    params = module.init({"params": jax.random.PRNGKey(0)}, pts, batch,
                         deterministic=True)["params"]
    out_f, jac_f, lap_f = model.derivative_apply(params, batch, None, True)

    def apply_fn(p):
        allp = jnp.concatenate([p, batch["boundary"]["C"]], -2)
        return module.apply({"params": params}, allp, batch,
                            deterministic=True)

    out_e, jac_e, lap_e = pinn_derivatives(apply_fn, batch["internal"]["C"])
    np.testing.assert_allclose(out_f, out_e, atol=1e-5)
    np.testing.assert_allclose(jac_f, jac_e, atol=atol_jac)
    np.testing.assert_allclose(lap_f, lap_e, atol=atol_lap)


def test_pipn_pp_fast_exact():
    batch = make_foam_batch(2, 32, 16, 8, seed=7)
    model = pipn.pipn_foam_pp(
        1489.4e-6, 14000.0, 17.11,
        fe_local_layers=[2, 16, 16],
        seg_layers=[24 + 16, 16, 3],
        fe_radius=[0.5, 1.0], fe_fraction=[0.5, 0.25],
        fe_global_layers=[[2 + 4 + 2, 16, 16], [16 + 2, 16, 16],
                          [16 + 2, 16, 24]],
        scalers=make_scalers())
    assert model.derivative_apply is not None
    check_exact(model, batch)


def test_pipn_pp_mrg_fast_exact():
    batch = make_foam_batch(2, 32, 16, 8, seed=8)
    model = pipn.pipn_foam_pp_mrg(
        n_dims=2, mrg_in_features=4 + 2,
        nu=1489.4e-6, d=14000.0, f=17.11,
        fe_local_layers=[2, 16, 16],
        seg_layers=[1024 + 16, 16, 3],
        scalers=make_scalers())
    assert model.derivative_apply is not None
    check_exact(model, batch)


def test_pi_gano_pp_fast_exact():
    batch = make_foam_batch(2, 32, 16, 8, seed=9)
    model = pg.pi_gano_pp(
        1489.4e-6, 3,
        branch_layers=[8, 16, 40],
        geometry_layers=[[2 * 2 + 4, 16, 16], [16 + 2, 16, 16],
                         [16 + 2, 16, 24]],
        geometry_radius=[0.5, 1.0], geometry_fraction=[0.5, 0.25],
        local_layers=[2, 16, 16],
        n_operators=2, operator_dropout=[0, 0],
        scalers=make_scalers(), variable_boundaries=VARIABLE_BOUNDARIES,
        max_neighbors=16)
    assert model.derivative_apply is not None
    check_exact(model, batch)


def test_neighbor_cache_parity():
    """attach_neighbors precomputes FPS/radius structures; the step must be
    bit-equivalent to on-the-fly computation (static clouds)."""
    import jax

    batch = make_foam_batch(3, 32, 16, 8, seed=11)
    model = pipn.pipn_foam_pp(
        1489.4e-6, 14000.0, 17.11,
        fe_local_layers=[2, 16, 16],
        seg_layers=[24 + 16, 16, 3],
        fe_radius=[0.5, 1.0], fe_fraction=[0.5, 0.25],
        fe_global_layers=[[2 + 4 + 2, 16, 16], [16 + 2, 16, 16],
                          [16 + 2, 16, 24]],
        scalers=make_scalers())
    assert model.neighbor_precompute is not None
    cached = model.attach_neighbors(batch)
    assert "sa_cent_0" in cached.domain and "sa_idx_1" in cached.domain

    pts = jnp.concatenate([batch["internal"]["C"], batch["boundary"]["C"]], -2)
    params = model.module.init({"params": jax.random.PRNGKey(0)}, pts, batch,
                               deterministic=True)["params"]
    out_a, jac_a, lap_a = model.derivative_apply(params, batch, None, True)
    out_b, jac_b, lap_b = model.derivative_apply(params, cached, None, True)
    np.testing.assert_array_equal(np.asarray(out_a), np.asarray(out_b))
    np.testing.assert_array_equal(np.asarray(jac_a), np.asarray(jac_b))
    # plain module forward also consumes the cache
    y_a = model.module.apply({"params": params}, pts, batch,
                             deterministic=True)
    y_b = model.module.apply({"params": params}, pts, cached,
                             deterministic=True)
    np.testing.assert_array_equal(np.asarray(y_a), np.asarray(y_b))


def test_manufactured_pp_fast_trains():
    from porous_cfd_tpu.data.manufactured import make_manufactured_batch
    batch = make_manufactured_batch(np.random.default_rng(0), 2, 32, 16)
    model = pipn.pipn_manufactured_pp(
        0.01, 50.0, 1.0,
        fe_local_layers=[2, 16, 16],
        fe_global_layers=[[2 * 2 + 2, 16], [16 + 2, 16], [16 + 2, 24]],
        fe_global_radius=[0.6, 1.2], fe_global_fraction=[0.5, 0.25],
        seg_layers=[24 + 16, 16, 3])
    assert model.derivative_apply is not None
    tx = make_optimizer(model, 1)
    fns = make_train_functions(model, tx)
    state = fns.init_state(batch)
    for _ in range(3):
        state, m = fns.train_step(state, batch)
    assert np.isfinite(float(m[0]))
