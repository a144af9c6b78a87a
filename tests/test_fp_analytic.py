"""Decoupled-hierarchy analytic path for the U-Net 'full' variants
(models/fp_analytic.py): the kNN-interpolation derivative math against
brute-force autodiff, the full path's (v, J, H) against autodiff of a
FROZEN-hierarchy reference (the function the decoupled semantics define),
value-stream parity with the module forward, and parameter-gradient flow."""
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from porous_cfd_tpu.data.synthetic import make_foam_batch, make_scalers
from porous_cfd_tpu.models import fp_analytic
from porous_cfd_tpu.models.pi_gano import pi_gano_pp_full
from porous_cfd_tpu.models.pipn import pipn_foam_pp_full

N_DIM, N_BID = 2, 4


def small_pp_full(fast=True):
    return pipn_foam_pp_full(
        nu=1489.4e-6, d=14000.0, f=17.11,
        enc_layers=[[N_DIM * 2 + 1 + N_BID, 16, 16],
                    [16 + N_DIM, 24, 24],
                    [24 + N_DIM, 48]],
        enc_radius=[0.4, 0.8], enc_fraction=[0.5, 0.5],
        dec_layers=[[48 + 24, 24, 24],
                    [16 + 24, 16, 16],
                    [16 + N_BID + N_DIM + 1, 16, 16, 3]],
        dec_k=[3, 3, 3],
        dec_dropout=[0.0, 0.0, [0.15, 0.0, 0.0]],
        scalers=make_scalers(), fast_derivatives=fast)


def small_gano_pp_full(fast=True):
    return pi_gano_pp_full(
        nu=1489.4e-6, out_features=3,
        branch_layers=[8, 16, 24],
        enc_layers=[[N_DIM * 2 + N_BID + 1, 16, 16],
                    [16 + N_DIM, 24, 24],
                    [24 + N_DIM, 48]],
        enc_radius=[0.5, 1.0], enc_fraction=[0.5, 0.5],
        dec_layers=[[48 + 24, 24, 24],
                    [16 + 24, 16, 16],
                    [16 + N_DIM + N_BID + 1, 16, 16, 3]],
        dec_k=[3, 3, 3],
        fp_dropout=[0.0, 0.0, [0.0, 0.2, 0.0]],
        scalers=make_scalers(),
        variable_boundaries={"Subdomains": ["inlet", "internal"],
                             "Features": ["U-inlet", "d", "f"]},
        fast_derivatives=fast)


def test_knn_interp_prop_matches_autodiff():
    rng = np.random.default_rng(3)
    b, m, n, k, f, d = 2, 10, 6, 3, 5, 2
    x_coarse = jnp.asarray(rng.normal(size=(b, m, f)), jnp.float32)
    pos_src = jnp.asarray(rng.uniform(-1, 1, size=(b, m, d)), jnp.float32)
    pos_q = jnp.asarray(rng.uniform(-1, 1, size=(b, n, d)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, m, size=(b, n, k)), jnp.int32)

    v, j, h = fp_analytic.knn_interp_prop(x_coarse, pos_src, pos_q, idx, n)

    def per_point(xq, feats, srcs):
        diff = xq[None, :] - srcs
        d2 = jnp.sum(diff * diff, axis=-1)
        w = 1.0 / jnp.maximum(d2, 1e-12)
        return jnp.sum(feats * w[:, None], axis=0) / jnp.sum(w)

    for bi in range(b):
        for ni in range(n):
            feats = x_coarse[bi][idx[bi, ni]]
            srcs = pos_src[bi][idx[bi, ni]]
            fn = lambda q: per_point(q, feats, srcs)
            np.testing.assert_allclose(np.asarray(fn(pos_q[bi, ni])),
                                       np.asarray(v[bi, ni]),
                                       rtol=1e-5, atol=1e-6)
            jac = jax.jacfwd(fn)(pos_q[bi, ni])            # (F, D)
            np.testing.assert_allclose(np.asarray(jac.T),
                                       np.asarray(j[bi, ni]),
                                       rtol=1e-4, atol=1e-4)
            hess = jax.jacfwd(jax.jacfwd(fn))(pos_q[bi, ni])  # (F, D, D)
            diag = jnp.stack([hess[:, dd, dd] for dd in range(d)])  # (D, F)
            np.testing.assert_allclose(np.asarray(diag),
                                       np.asarray(h[bi, ni]),
                                       rtol=1e-3, atol=1e-3)


def test_knn_interp_prop_clamped_coincident_point():
    """A query that coincides with a coarse point (d2 < clamp) keeps the
    forward's clamp semantics: huge constant weight, zero derivative."""
    b, m, k, f, d = 1, 4, 3, 2, 2
    rng = np.random.default_rng(5)
    x_coarse = jnp.asarray(rng.normal(size=(b, m, f)), jnp.float32)
    pos_src = jnp.asarray(rng.uniform(-1, 1, size=(b, m, d)), jnp.float32)
    pos_q = pos_src[:, :1]                       # exactly on coarse point 0
    idx = jnp.asarray([[[0, 1, 2]]], jnp.int32)
    v, j, h = fp_analytic.knn_interp_prop(x_coarse, pos_src, pos_q, idx, 1)
    assert np.all(np.isfinite(np.asarray(v)))
    assert np.all(np.isfinite(np.asarray(j)))
    assert np.all(np.isfinite(np.asarray(h)))
    # the clamped weight (1e12) dominates: value == that coarse feature
    np.testing.assert_allclose(np.asarray(v[0, 0]),
                               np.asarray(x_coarse[0, 0]), rtol=1e-4)


@pytest.mark.parametrize("family", ["pipn_pp_full", "gano_pp_full"])
def test_full_path_value_and_frozen_hierarchy_derivatives(family):
    """The decoupled path's value equals the module forward exactly, and its
    J/H equal brute-force autodiff of the FROZEN-hierarchy function (coarse
    features/positions held at their unperturbed values — the function the
    decoupled semantics differentiate)."""
    from porous_cfd_tpu.data.foam_data import split_contiguous
    from porous_cfd_tpu.models.neighbors import extract_fp_idx
    from porous_cfd_tpu.physics import analytic

    model = (small_pp_full() if family == "pipn_pp_full"
             else small_gano_pp_full())
    module = model.module
    ds = make_foam_batch(2, 24, 16, 8, rng=np.random.default_rng(11))
    batch = model.attach_neighbors(ds)
    params = module.init(jax.random.PRNGKey(0), batch["C"], batch)["params"]

    out, jac, lap = model.derivative_apply(params, batch, None, True)
    ref_fwd = module.apply({"params": params}, batch["C"], batch, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_fwd),
                               rtol=2e-4, atol=2e-5)

    # frozen-hierarchy reference: recompute coarse features once, then
    # autodiff interp-weights + skip + final MLP w.r.t. per-point coords
    internal_view, boundary_view = split_contiguous(batch)
    x_int = internal_view["C"]
    n_int = x_int.shape[-2]
    pts = jnp.concatenate([x_int, boundary_view["C"]], axis=-2)
    fp_idx = extract_fp_idx(batch.domain, 3)

    fn = model.derivative_apply

    # reconstruct the coarse level exactly as the path does
    import porous_cfd_tpu.models.fp_analytic as fpa
    captured = {}
    orig = fpa.knn_interp_prop

    def capture(x_coarse, pos_src, pos_query, idx, n):
        captured["x"] = x_coarse
        captured["pos"] = pos_src
        return orig(x_coarse, pos_src, pos_query, idx, n)

    fpa.knn_interp_prop = capture
    try:
        fn(params, batch, None, True)
    finally:
        fpa.knn_interp_prop = orig
    x_coarse, pos_coarse = captured["x"], captured["pos"]

    sdf, bid = batch["sdf"], batch["boundaryId"]
    if family == "pipn_pp_full":
        mlp_params = params["decoder"]["fp_2"]["mlp"]
        layers = module.dec_layers[-1]
        par_red = None
    else:
        last = params["decoder"]["fpno_2"]
        mlp_params = last["mlp"]
        layers = module.dec_layers[-1]
        from porous_cfd_tpu.models.pi_gano import gather_parameters
        from porous_cfd_tpu.models.pipn import _pointnet_global_dispatch
        par = _pointnet_global_dispatch(
            params["branch"]["linear"], module.branch_layers,
            gather_parameters(batch, module.variable_boundaries),
            module.activation)
        par_red = module.activation(par @ last["par_reduce"]["kernel"]
                                    + last["par_reduce"]["bias"])

    def frozen_point(q, bi, ni):
        """Final-stage output at internal point ni of case bi as a function
        of its own coords only (hierarchy frozen)."""
        feats = x_coarse[bi][fp_idx[2][bi, ni]]
        srcs = pos_coarse[bi][fp_idx[2][bi, ni]]
        diff = q[None, :] - srcs
        d2 = jnp.sum(diff * diff, axis=-1)
        w = 1.0 / jnp.maximum(d2, 1e-12)
        interp = jnp.sum(feats * w[:, None], axis=0) / jnp.sum(w)
        x_up = jnp.concatenate([interp, sdf[bi, ni], bid[bi, ni], q])
        v = x_up[None, :]
        for i in range(len(layers) - 1):
            p = mlp_params[f"linear_{i}"]
            v = v @ p["kernel"] + p["bias"]
            if i < len(layers) - 2:
                v = module.activation(v)
        v = v[0]
        if par_red is not None:
            v = v * par_red[bi, 0]
        return v

    for bi in range(2):
        for ni in (0, 7, n_int - 1):
            q0 = pts[bi, ni]
            jac_ref = jax.jacfwd(lambda q: frozen_point(q, bi, ni))(q0)
            hess_ref = jax.jacfwd(jax.jacfwd(
                lambda q: frozen_point(q, bi, ni)))(q0)
            np.testing.assert_allclose(
                np.asarray(jac_ref), np.asarray(jac[bi, ni]),
                rtol=2e-3, atol=2e-4,
                err_msg=f"J mismatch case {bi} point {ni}")
            diag = np.stack([np.asarray(hess_ref)[:, dd, dd]
                             for dd in range(2)], axis=-1)
            np.testing.assert_allclose(
                diag, np.asarray(lap[bi, ni]),
                rtol=5e-3, atol=5e-4,
                err_msg=f"H mismatch case {bi} point {ni}")


@pytest.mark.parametrize("family", ["pipn_pp_full", "gano_pp_full"])
def test_param_gradients_flow_through_hierarchy(family):
    """The loss gradient reaches the SA encoder parameters through both the
    value stream and the (linear-in-F_k) derivative streams."""
    model = (small_pp_full() if family == "pipn_pp_full"
             else small_gano_pp_full())
    ds = make_foam_batch(2, 24, 16, 8, rng=np.random.default_rng(7))
    batch = model.attach_neighbors(ds)
    params = model.module.init(jax.random.PRNGKey(0), batch["C"], batch
                               )["params"]

    def loss(p):
        out, jac, lap = model.derivative_apply(p, batch, None, True)
        return (jnp.sum(out ** 2) + jnp.sum(jac ** 2)
                + 0.1 * jnp.sum(lap ** 2))

    grads = jax.grad(loss)(params)
    enc_leaves = jax.tree_util.tree_leaves(grads["encoder"])
    assert all(np.all(np.isfinite(np.asarray(g))) for g in enc_leaves)
    assert any(float(jnp.max(jnp.abs(g))) > 0 for g in enc_leaves)


def test_dropout_path_runs_and_differs():
    """Non-deterministic mode draws the last-level dropout; two different
    keys give different outputs, the same key reproduces."""
    model = small_pp_full()
    ds = make_foam_batch(1, 24, 16, 8, rng=np.random.default_rng(9))
    batch = model.attach_neighbors(ds)
    params = model.module.init(jax.random.PRNGKey(0), batch["C"], batch
                               )["params"]
    o1, _, _ = model.derivative_apply(params, batch, jax.random.PRNGKey(1),
                                      False)
    o1b, _, _ = model.derivative_apply(params, batch, jax.random.PRNGKey(1),
                                       False)
    o2, _, _ = model.derivative_apply(params, batch, jax.random.PRNGKey(2),
                                      False)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o1b))
    assert np.abs(np.asarray(o1) - np.asarray(o2)).max() > 1e-6
