"""Model-zoo tests: every family forward-passes, jits, and takes a full
training step (forward + fused second-order derivatives + Adam update)."""
import jax.numpy as jnp
import numpy as np
import pytest

from helpers import VARIABLE_BOUNDARIES, make_foam_batch, make_scalers
from porous_cfd_tpu.models import pi_gano as pg
from porous_cfd_tpu.models import pipn
from porous_cfd_tpu.train.engine import make_optimizer, make_train_functions

NU, D, F = 1489.4e-6, 14000.0, 17.11
N_BID = 4  # patches in the test fixture


def model_zoo():
    scalers = make_scalers()
    zoo = {
        "pipn": pipn.pipn_foam(
            NU, D, F,
            fe_local_layers=[2, 16, 16],
            fe_global_layers=[16 + 1 + N_BID, 24, 32],
            seg_layers=[32 + 16, 24, 3],
            seg_dropout=[0.05, 0],
            scalers=scalers),
        "pipn-pp": pipn.pipn_foam_pp(
            NU, D, F,
            fe_local_layers=[2, 16, 16],
            seg_layers=[32 + 16, 24, 3],
            fe_radius=[0.5, 1.0],
            fe_fraction=[0.5, 0.25],
            fe_global_layers=[[2 + N_BID + 2, 16, 16],
                              [16 + 2, 24, 24],
                              [24 + 2, 24, 32]],
            scalers=scalers),
        "pipn-pp-mrg": pipn.pipn_foam_pp_mrg(
            n_dims=2, mrg_in_features=N_BID + 2,
            nu=NU, d=D, f=F,
            fe_local_layers=[2, 16, 16],
            seg_layers=[1024 + 16, 24, 3],
            scalers=scalers),
        "pipn-pp-full": pipn.pipn_foam_pp_full(
            NU, D, F,
            enc_layers=[[2 * 2 + 1 + N_BID, 16, 16, 24],
                        [24 + 2, 24, 24, 32],
                        [32 + 2, 48]],
            enc_radius=[0.4, 0.8],
            enc_fraction=[0.5, 0.25],
            dec_layers=[[48 + 32, 32, 32],
                        [24 + 32, 24, 24],
                        [24 + N_BID + 2 + 1, 24, 24, 3]],
            dec_k=[3, 3, 3],
            dec_dropout=[0.0, 0.0, [0.15, 0.15, 0.0]],
            scalers=scalers),
        "pi-gano": pg.pi_gano(
            NU, out_features=3,
            branch_layers=[8, 16, 48],
            geometry_layers=[2 + N_BID + 1, 16, 24],
            local_layers=[2, 16, 24],
            n_operators=3,
            operator_dropout=[0, 0.1, 0],
            scalers=scalers,
            variable_boundaries=VARIABLE_BOUNDARIES),
        "pi-gano-full": pg.pi_gano(
            NU, out_features=3,
            branch_layers=[8, 16, 48],
            geometry_layers=[2 + N_BID + 1, 16, 24],
            local_layers=[2, 16, 24],
            n_operators=3,
            operator_dropout=[0, 0.1, 0],
            scalers=scalers,
            variable_boundaries=VARIABLE_BOUNDARIES,
            full=True),
        "pi-gano-pp": pg.pi_gano_pp(
            NU, out_features=3,
            branch_layers=[8, 16, 48],
            geometry_layers=[[2 * 2 + N_BID, 16, 16],
                             [16 + 2, 24, 24],
                             [24 + 2, 24, 24]],
            geometry_radius=[0.5, 1.0],
            geometry_fraction=[0.5, 0.25],
            local_layers=[2, 16, 24],
            n_operators=3,
            operator_dropout=[0, 0.1, 0],
            scalers=scalers,
            variable_boundaries=VARIABLE_BOUNDARIES,
            max_neighbors=32),
        "pi-gano-pp-full": pg.pi_gano_pp_full(
            NU, out_features=3,
            branch_layers=[8, 16, 24],
            enc_layers=[[2 * 2 + N_BID + 1, 16, 16, 24],
                        [24 + 2, 24, 24, 32],
                        [32 + 2, 48]],
            enc_radius=[0.5, 1.0],
            enc_fraction=[0.5, 0.25],
            dec_layers=[[48 + 32, 32, 32],
                        [24 + 32, 24, 24],
                        [24 + 2 + N_BID + 1, 24, 24, 3]],
            dec_k=[3, 3, 3],
            fp_dropout=[0.0, 0.0, [0.0, 0.2, 0.0]],
            scalers=scalers,
            variable_boundaries=VARIABLE_BOUNDARIES),
    }
    return zoo


NAMES = list(model_zoo().keys())


@pytest.mark.parametrize("name", NAMES)
def test_train_step_all_families(name):
    model = model_zoo()[name]
    batch = make_foam_batch(batch_size=2, n_internal=24, n_boundary=16)
    tx = make_optimizer(model, steps_per_epoch=1)
    fns = make_train_functions(model, tx)
    state = fns.init_state(batch)
    state, metrics = fns.train_step(state, batch)
    assert np.isfinite(float(metrics[0])), f"{name}: non-finite loss"
    # obs losses present for all foam models
    assert len(metrics) == 1 + model.num_losses + 1 + model.dims


@pytest.mark.parametrize("name", NAMES)
def test_predict_shapes(name):
    model = model_zoo()[name]
    batch = make_foam_batch(batch_size=2, n_internal=24, n_boundary=16)
    tx = make_optimizer(model, 1)
    fns = make_train_functions(model, tx)
    state = fns.init_state(batch)
    pred = fns.predict_batch(state.params, batch, False)
    assert pred.data.shape == (2, 40, 3)
    pred, extras = fns.predict_batch(state.params, batch, True)
    assert extras.data.shape == (2, 24, 3)
    assert np.isfinite(np.asarray(extras.data)).all()


def test_gather_parameters_layout():
    batch = make_foam_batch(batch_size=2, n_internal=24, n_boundary=16)
    params = pg.gather_parameters(batch, VARIABLE_BOUNDARIES)
    # inlet (4 rows) + internal (24 rows); C(2) + U-inlet(2) + d(2) + f(2)
    assert params.shape == (2, 28, 8)
    # inlet rows carry the inlet velocity in the U-inlet columns
    inlet = batch["inlet"]
    np.testing.assert_allclose(params[:, :4, 2:4], inlet["U"])
    # internal rows have zero U-inlet, nonzero d in porous zone
    np.testing.assert_allclose(params[:, 4:, 2:4], 0.0)
