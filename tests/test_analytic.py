"""Analytic derivative-propagation fast path: equivalence with the exact
autodiff operator (away from max-pool argmax rows) and speed-path training."""
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from porous_cfd_tpu.data.synthetic import make_foam_batch, make_scalers
from porous_cfd_tpu.models.mlp import MLP
from porous_cfd_tpu.models.pipn import (PipnModule, pipn_apply_with_derivatives,
                                        pipn_foam)
from porous_cfd_tpu.physics import analytic
from porous_cfd_tpu.physics.operators import pinn_derivatives
from porous_cfd_tpu.train.engine import make_optimizer, make_train_functions


def test_mlp_prop_matches_autodiff():
    """(v, J, H) through a plain MLP equals nested autodiff exactly."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 40, 2)), jnp.float32)
    for act in [nn.tanh, nn.silu]:
        m = MLP([2, 16, 16, 3], activation=act, last_activation=False)
        params = m.init(jax.random.PRNGKey(0), x)["params"]

        j0, h0 = analytic.identity_jacobian(x)
        v, j, h = analytic.mlp_prop(params, [2, 16, 16, 3], x, j0, h0, act,
                                    last_activation=False)

        out, jac, lap = pinn_derivatives(
            lambda p: m.apply({"params": params}, p), x)
        np.testing.assert_allclose(v, out, atol=1e-5)
        np.testing.assert_allclose(jnp.swapaxes(j, -1, -2), jac, atol=1e-4)
        np.testing.assert_allclose(jnp.swapaxes(h, -1, -2), lap, atol=1e-4)


def test_activation_rules_numerics():
    v = jnp.linspace(-3, 3, 101)
    for act, rules in [(jnp.tanh, analytic.tanh_rules),
                       (jax.nn.silu, analytic.silu_rules)]:
        val, d1, d2 = rules(v)
        np.testing.assert_allclose(val, act(v), atol=1e-6)
        np.testing.assert_allclose(d1, jax.vmap(jax.grad(act))(v), atol=1e-5)
        np.testing.assert_allclose(
            d2, jax.vmap(jax.grad(jax.grad(act)))(v), atol=1e-5)


def test_pipn_fast_path_matches_true_per_point_derivatives():
    """The coupled fast path computes the TRUE per-point derivatives —
    including the max-pool argmax coupling through the global feature — and
    must match brute-force per-point autodiff (diagonal blocks of the full
    Jacobian/Hessian) to machine precision at EVERY row, winners included."""
    batch = make_foam_batch(1, 24, 8, 4, seed=7)
    module = PipnModule([2, 12, 12], [12 + 5, 12, 16], [28, 12, 3],
                        activation=nn.silu)
    pts = jnp.concatenate([batch["internal"]["C"], batch["boundary"]["C"]], -2)
    params = module.init({"params": jax.random.PRNGKey(2)}, pts, batch,
                         deterministic=True)["params"]
    fast = pipn_apply_with_derivatives(module)
    out_f, jac_f, lap_f = fast(params, batch, None, True)

    x_int = batch["internal"]["C"][0]
    x_bnd = batch["boundary"]["C"][0]

    def per_rows(pi):
        allp = jnp.concatenate([pi[None], x_bnd[None]], axis=-2)
        return module.apply({"params": params}, allp, batch,
                            deterministic=True)[0]

    jac_full = jax.jacrev(per_rows)(x_int)               # (Nall, O, Ni, D)
    hes_full = jax.jacfwd(jax.jacrev(per_rows))(x_int)   # (..., Ni, D, Ni, D)
    n_int, dims = x_int.shape
    true_j = np.stack([np.asarray(jac_full[i, :, i, :])
                       for i in range(n_int)])
    true_h = np.stack([np.stack([np.asarray(hes_full[i, :, i, k, i, k])
                                 for k in range(dims)], axis=-1)
                       for i in range(n_int)])
    # ensure the coupling is actually exercised: internal rows win channels
    feats = jnp.concatenate([batch["boundaryId"], batch["sdf"]], -1)
    local = analytic.mlp_value(params["feature_extract"]["local_feature"],
                               [2, 12, 12], pts[0], nn.silu)
    gv = analytic.mlp_value(params["feature_extract"]["global_feature"],
                            [12 + 5, 12, 16],
                            jnp.concatenate([local, feats[0]], -1), nn.silu)
    assert int(jnp.sum(jnp.argmax(gv, axis=-2) < n_int)) >= 1
    np.testing.assert_allclose(np.asarray(jac_f[0]), true_j, atol=1e-5)
    np.testing.assert_allclose(np.asarray(lap_f[0]), true_h, atol=1e-4)


def test_pipn_fast_path_matches_autodiff_off_argmax():
    """Vs the exact grad-of-SUM operator (reference torch semantics): the
    fast path's Jacobian agrees exactly away from max-pool argmax rows; AT
    winner rows the two differ by genuinely cross-point terms (sum-aggregated
    context sensitivity vs the true per-point self term). The Laplacian
    carries small mixed-derivative contamination at every row under the
    grad-of-sum semantics."""
    batch = make_foam_batch(2, 48, 16, 8, seed=3)
    module = PipnModule([2, 16, 16], [16 + 5, 16, 24], [40, 16, 3],
                        activation=nn.silu)
    pts = jnp.concatenate([batch["internal"]["C"], batch["boundary"]["C"]], -2)
    params = module.init({"params": jax.random.PRNGKey(0)}, pts, batch,
                         deterministic=True)["params"]

    fast = pipn_apply_with_derivatives(module)
    out_f, jac_f, lap_f = fast(params, batch, None, True)

    def apply_fn(p):
        allp = jnp.concatenate([p, batch["boundary"]["C"]], -2)
        return module.apply({"params": params}, allp, batch,
                            deterministic=True)

    out_e, jac_e, lap_e = pinn_derivatives(apply_fn, batch["internal"]["C"])
    np.testing.assert_allclose(out_f, out_e, atol=1e-5)

    # identify argmax rows of the global max-pool per batch element
    feats = jnp.concatenate([batch["boundaryId"], batch["sdf"]], -1)

    def global_pre(b_idx):
        local = analytic.mlp_value(params["feature_extract"]["local_feature"],
                                   [2, 16, 16], pts[b_idx], nn.silu)
        g_in = jnp.concatenate([local, feats[b_idx]], -1)
        return analytic.mlp_value(params["feature_extract"]["global_feature"],
                                  [16 + 5, 16, 24], g_in, nn.silu)

    jac_f, jac_e = np.asarray(jac_f), np.asarray(jac_e)
    lap_f, lap_e = np.asarray(lap_f), np.asarray(lap_e)
    for b in range(2):
        argmax_rows = set(np.asarray(
            jnp.argmax(global_pre(b), axis=-2)).tolist())
        clean = [i for i in range(48) if i not in argmax_rows]
        # Jacobian: exact agreement away from argmax rows
        np.testing.assert_allclose(jac_f[b, clean], jac_e[b, clean], atol=1e-4)
        # ... and genuine disagreement AT them (the cross-point coupling)
        dirty = sorted(r for r in argmax_rows if r < 48)
        assert np.abs(jac_f[b, dirty] - jac_e[b, dirty]).max() > 1e-3
        # Laplacian: mixed-term contamination everywhere under torch
        # semantics — bounded mean deviation, large only at argmax rows
        assert np.abs(lap_f[b, clean] - lap_e[b, clean]).mean() < 0.05
        assert np.abs(lap_f[b] - lap_e[b]).mean() < 0.05


def test_fast_path_training_step():
    """A pipn_foam model with fast_derivatives trains: finite loss, decreasing."""
    batch = make_foam_batch(4, 40, 16, 8, seed=4)
    model = pipn_foam(1489.4e-6, 14000.0, 17.11,
                      [2, 16, 16], [16 + 5, 16, 24], [40, 16, 3],
                      seg_dropout=[0.05, 0],
                      scalers=make_scalers(), fast_derivatives=True)
    assert model.derivative_apply is not None
    tx = make_optimizer(model, 1)
    fns = make_train_functions(model, tx)
    state = fns.init_state(batch)
    first = None
    for _ in range(10):
        state, m = fns.train_step(state, batch)
        first = first if first is not None else float(m[0])
    assert np.isfinite(float(m[0]))
    assert float(m[0]) < first

    pred, extras = fns.predict_batch(state.params, batch, True)
    assert np.isfinite(np.asarray(extras.data)).all()


def test_winner_gather_matches_dense_coupled_path():
    """The winner-gather fused route (pointnet argmax + gathered global
    chains + additive layer-0 terms) must equal the dense coupled analytic
    path for outputs, J and H."""
    import porous_cfd_tpu.models.pipn as pipn_mod

    batch = make_foam_batch(2, 24, 8, 4, seed=9)
    module = PipnModule([2, 12, 12], [12 + 5, 12, 16], [28, 12, 3],
                        activation=nn.silu)
    pts = jnp.concatenate([batch["internal"]["C"], batch["boundary"]["C"]], -2)
    params = module.init({"params": jax.random.PRNGKey(4)}, pts, batch,
                         deterministic=True)["params"]
    fast = pipn_apply_with_derivatives(module)
    dense = fast(params, batch, None, True)
    pipn_mod.FORCE_WINNER_GATHER = True
    try:
        gathered = fast(params, batch, None, True)
    finally:
        pipn_mod.FORCE_WINNER_GATHER = False
    for d, gt, name in zip(dense, gathered, ("v", "jac", "lap")):
        np.testing.assert_allclose(np.asarray(gt), np.asarray(d), atol=2e-5,
                                   err_msg=f"component {name}")

    # gradients agree too (one scalar loss through all three outputs)
    def loss(p):
        ov, oj, oh = fast(p, batch, None, True)
        return jnp.sum(ov ** 2) + jnp.sum(oj ** 2) + 0.5 * jnp.sum(oh ** 2)

    g_dense = jax.grad(loss)(params)
    pipn_mod.FORCE_WINNER_GATHER = True
    try:
        g_gather = jax.grad(loss)(params)
    finally:
        pipn_mod.FORCE_WINNER_GATHER = False
    for a, b in zip(jax.tree_util.tree_leaves(g_dense),
                    jax.tree_util.tree_leaves(g_gather)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=5e-4,
                                   rtol=1e-3)


def test_decoupled_speed_mode():
    """coupled_context=False: context treated as locally constant — agrees
    with the coupled path everywhere EXCEPT max-pool winner rows, and with
    the exact operator off-argmax."""
    batch = make_foam_batch(1, 24, 8, 4, seed=12)
    module = PipnModule([2, 12, 12], [12 + 5, 12, 16], [28, 12, 3],
                        activation=nn.silu)
    pts = jnp.concatenate([batch["internal"]["C"], batch["boundary"]["C"]], -2)
    params = module.init({"params": jax.random.PRNGKey(6)}, pts, batch,
                         deterministic=True)["params"]
    coupled = pipn_apply_with_derivatives(module, coupled=True)(
        params, batch, None, True)
    fast = pipn_apply_with_derivatives(module, coupled=False)(
        params, batch, None, True)
    np.testing.assert_allclose(np.asarray(fast[0]), np.asarray(coupled[0]),
                               atol=1e-5)  # values identical
    feats = jnp.concatenate([batch["boundaryId"], batch["sdf"]], -1)
    local = analytic.mlp_value(params["feature_extract"]["local_feature"],
                               [2, 12, 12], pts[0], nn.silu)
    gv = analytic.mlp_value(params["feature_extract"]["global_feature"],
                            [12 + 5, 12, 16],
                            jnp.concatenate([local, feats[0]], -1), nn.silu)
    winners = set(np.asarray(jnp.argmax(gv, axis=-2)).tolist())
    clean = [i for i in range(24) if i not in winners]
    np.testing.assert_allclose(np.asarray(fast[1])[0, clean],
                               np.asarray(coupled[1])[0, clean], atol=1e-5)
    dirty = sorted(r for r in winners if r < 24)
    if dirty:  # coupling actually differs at winner rows
        assert np.abs(np.asarray(fast[1])[0, dirty]
                      - np.asarray(coupled[1])[0, dirty]).max() > 1e-4
