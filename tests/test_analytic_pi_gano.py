"""PI-GANO analytic fast path: parity with the exact autodiff operator.
Since the reference stop-gradients the geometry coordinates (pi_gano.py:59)
and the branch features come from batch data (not the differentiable points),
the PI-GANO trunk is purely pointwise — the fast path should match the exact
operator EVERYWHERE (no max-pool coupling on the differentiated path)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from porous_cfd_tpu.data.synthetic import (VARIABLE_BOUNDARIES,
                                           make_foam_batch, make_scalers)
from porous_cfd_tpu.models.pi_gano import (PiGanoModule, pi_gano,
                                           pi_gano_apply_with_derivatives)
from porous_cfd_tpu.physics.operators import pinn_derivatives
from porous_cfd_tpu.train.engine import make_optimizer, make_train_functions


@pytest.mark.parametrize("full", [False, True])
def test_pi_gano_fast_path_matches_autodiff(full):
    batch = make_foam_batch(2, 32, 16, 8, seed=5)
    module = PiGanoModule(out_features=3,
                          branch_layers=[8, 16, 40],
                          geometry_layers=[2 + 4 + 1, 16, 24],
                          local_layers=[2, 16, 16],
                          n_operators=2,
                          operator_dropout=[0, 0],
                          variable_boundaries=VARIABLE_BOUNDARIES,
                          full=full)
    pts = jnp.concatenate([batch["internal"]["C"], batch["boundary"]["C"]], -2)
    params = module.init({"params": jax.random.PRNGKey(0)}, pts, batch,
                         deterministic=True)["params"]

    fast = pi_gano_apply_with_derivatives(module)
    out_f, jac_f, lap_f = fast(params, batch, None, True)

    def apply_fn(p):
        allp = jnp.concatenate([p, batch["boundary"]["C"]], -2)
        return module.apply({"params": params}, allp, batch,
                            deterministic=True)

    out_e, jac_e, lap_e = pinn_derivatives(apply_fn, batch["internal"]["C"])
    np.testing.assert_allclose(out_f, out_e, atol=1e-5)
    np.testing.assert_allclose(jac_f, jac_e, atol=1e-4)
    np.testing.assert_allclose(lap_f, lap_e, atol=1e-3)


def test_pi_gano_fast_training_step():
    batch = make_foam_batch(2, 32, 16, 8, seed=6)
    model = pi_gano(1489.4e-6, 3,
                    branch_layers=[8, 16, 40],
                    geometry_layers=[7, 16, 24],
                    local_layers=[2, 16, 16],
                    n_operators=2,
                    operator_dropout=[0, 0.1],
                    scalers=make_scalers(),
                    variable_boundaries=VARIABLE_BOUNDARIES,
                    fast_derivatives=True)
    assert model.derivative_apply is not None
    tx = make_optimizer(model, 1)
    fns = make_train_functions(model, tx)
    state = fns.init_state(batch)
    first = None
    for _ in range(8):
        state, m = fns.train_step(state, batch)
        first = first if first is not None else float(m[0])
    assert np.isfinite(float(m[0]))
    assert float(m[0]) < first
