"""Parity tests for the fused SetAbstraction neighborhood kernel
(ops/sa_pallas.py) against the dense XLA modules (interpret mode off-TPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax.core import unfreeze

from porous_cfd_tpu.models.neighbors import sa_chain_precompute
from porous_cfd_tpu.models.set_abstraction import (SetAbstraction,
                                                   SetAbstractionSeq)
from porous_cfd_tpu.ops import sa_pallas

B, N, D, F_IN = 3, 40, 2, 5
LAYERS = [F_IN + D, 16, 24]


def _setup(n=N, f_in=F_IN, layers=LAYERS, fraction=0.5, radius=0.6,
           max_neighbors=8, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(B, n, f_in)), jnp.float32)
    pos = jnp.asarray(rng.uniform(-1, 1, size=(B, n, D)), jnp.float32)
    nbrs = sa_chain_precompute(pos, [fraction], [radius], max_neighbors)
    neighbors = (nbrs["sa_cent_0"], nbrs["sa_idx_0"], nbrs["sa_mask_0"],
                 nbrs["sa_rel_0"], nbrs["sa_posc_0"])
    module = SetAbstraction(fraction, radius, layers, max_neighbors,
                            activation=jax.nn.silu)
    params = unfreeze(module.init(jax.random.PRNGKey(1), x, pos, True,
                                  neighbors))["params"]
    return module, params, x, pos, neighbors


def _fused(params, layers, x, pos, neighbors, r):
    centroids, idx, mask, rel = neighbors[:4]
    return sa_pallas.sa_neighborhood(params["conv_mlp"], layers, x, pos,
                                     idx, mask, r, jax.nn.silu, rel=rel)


def test_forward_matches_dense():
    module, params, x, pos, neighbors = _setup()
    dense, _ = module.apply({"params": params}, x, pos, True, neighbors)
    fused = _fused(params, LAYERS, x, pos, neighbors, module.r)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(dense),
                               rtol=2e-5, atol=2e-5)


def test_forward_single_layer():
    layers = [F_IN + D, 24]
    module, params, x, pos, neighbors = _setup(layers=layers)
    dense, _ = module.apply({"params": params}, x, pos, True, neighbors)
    fused = _fused(params, layers, x, pos, neighbors, module.r)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(dense),
                               rtol=2e-5, atol=2e-5)


def test_empty_neighborhoods_zero():
    module, params, x, pos, neighbors = _setup(radius=0.05, max_neighbors=4)
    centroids, idx, mask = neighbors[:3]
    # force some fully-empty neighborhoods (a centroid is always its own
    # neighbor, so radius search alone never produces one)
    mask = mask.at[:, ::3].set(False)
    neighbors = (centroids, idx, mask) + neighbors[3:]
    dense, _ = module.apply({"params": params}, x, pos, True, neighbors)
    fused = _fused(params, LAYERS, x, pos, neighbors, module.r)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(dense),
                               rtol=2e-5, atol=2e-5)
    empty = ~jnp.any(mask, axis=-1)
    assert np.all(np.asarray(fused)[np.asarray(empty)] == 0.0)


def test_gradients_match_dense():
    module, params, x, pos, neighbors = _setup()
    cot = jnp.asarray(np.random.default_rng(3).normal(
        size=(B, neighbors[0].shape[1], LAYERS[-1])), jnp.float32)

    def loss_dense(p, xx):
        out, _ = module.apply({"params": p}, xx, pos, True, neighbors)
        return jnp.sum(out * cot)

    def loss_fused(p, xx):
        return jnp.sum(_fused(p, LAYERS, xx, pos, neighbors, module.r) * cot)

    gd_p, gd_x = jax.grad(loss_dense, argnums=(0, 1))(params, x)
    gf_p, gf_x = jax.grad(loss_fused, argnums=(0, 1))(params, x)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                rtol=2e-4, atol=2e-4),
        gd_p, gf_p)
    np.testing.assert_allclose(np.asarray(gf_x), np.asarray(gd_x),
                               rtol=2e-4, atol=2e-4)


def test_seq_fused_matches_module():
    rng = np.random.default_rng(7)
    f_in = 6
    fractions, radii = [0.5, 0.25], [0.5, 1.0]
    conv = [[f_in + D, 16, 16], [16 + D, 24, 24], [24 + D, 16, 32]]
    x = jnp.asarray(rng.normal(size=(B, N, f_in)), jnp.float32)
    pos = jnp.asarray(rng.uniform(-1, 1, size=(B, N, D)), jnp.float32)
    chain = sa_chain_precompute(pos, fractions, radii, 8)
    nbrs = [(chain[f"sa_cent_{i}"], chain[f"sa_idx_{i}"],
             chain[f"sa_mask_{i}"], chain[f"sa_rel_{i}"],
             chain[f"sa_posc_{i}"]) for i in range(2)]
    module = SetAbstractionSeq(fractions, radii, conv, return_skip=False,
                               activation=jax.nn.silu, max_neighbors=8)
    params = unfreeze(module.init(jax.random.PRNGKey(2), x, pos, True,
                                  nbrs))["params"]
    dense, _ = module.apply({"params": params}, x, pos, True, nbrs)
    fused = sa_pallas.sa_seq_fused(params, fractions, radii, conv, 8,
                                   jax.nn.silu, x, pos, nbrs)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(dense),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("family", ["pp", "mrg", "gano_pp"])
def test_model_fast_path_matches_xla(family):
    """Full-model parity: the ++-family analytic fast paths produce identical
    (out, jac, lap) whether the geometry branch runs the fused SA kernels
    (FORCE hook, interpret mode) or the dense XLA modules."""
    import jax.random as jrandom

    from porous_cfd_tpu.data.synthetic import make_foam_batch, make_scalers
    from porous_cfd_tpu.models.pipn import pipn_foam_pp, pipn_foam_pp_mrg
    from porous_cfd_tpu.models.pi_gano import pi_gano_pp
    from porous_cfd_tpu.train.engine import gather_cases

    scalers = make_scalers()
    if family == "pp":
        model = pipn_foam_pp(
            nu=1e-3, d=100.0, f=1.0, fe_local_layers=[2, 16, 16],
            seg_layers=[32 + 16, 24, 3], seg_dropout=[0.0, 0],
            fe_radius=[0.5, 1], fe_fraction=[0.5, 0.25],
            fe_global_layers=[[2 + 4 + 2, 16, 16], [16 + 2, 24, 24],
                              [24 + 2, 24, 32]],
            scalers=scalers, max_neighbors=8)
    elif family == "mrg":
        model = pipn_foam_pp_mrg(
            n_dims=2, mrg_in_features=6, nu=1e-3, d=100.0, f=1.0,
            fe_local_layers=[2, 16, 16], seg_layers=[1024 + 16, 24, 3],
            scalers=scalers, max_neighbors=8)
    else:
        model = pi_gano_pp(
            nu=1e-3, out_features=3,
            branch_layers=[8, 16, 32, 32],
            geometry_layers=[[2 * 2 + 4, 16, 16], [16 + 2, 16, 16],
                             [16 + 2, 16, 16]],
            geometry_radius=[0.5, 1], geometry_fraction=[0.5, 0.25],
            local_layers=[2, 16, 16, 16],
            n_operators=3, operator_dropout=[0, 0, 0],
            scalers=scalers,
            variable_boundaries={"Subdomains": ["inlet", "internal"],
                                 "Features": ["U-inlet", "d", "f"]},
            max_neighbors=8)

    batch = model.attach_neighbors(
        make_foam_batch(2, 24, 16, 8, rng=np.random.default_rng(5)))
    import jax.numpy as _jnp
    batch = gather_cases(batch, _jnp.arange(2))
    params = model.module.init(jrandom.PRNGKey(0), batch["C"], batch, True)
    params = unfreeze(params)["params"]

    base = model.derivative_apply(params, batch, None, True)
    sa_pallas.FORCE = True
    try:
        fused = model.derivative_apply(params, batch, None, True)
    finally:
        sa_pallas.FORCE = False
    for a, b, name in zip(base, fused, ["out", "jac", "lap"]):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-4, atol=5e-4, err_msg=name)


def test_static_xg_matches_dynamic():
    """The static pre-gathered first-layer path (sa_xg_0) matches the dynamic
    one-hot-gather path in values and parameter gradients, including with
    centroid padding and empty neighborhoods."""
    module, params, x, pos, neighbors = _setup(n=42, fraction=0.31)
    centroids, idx, mask, rel = neighbors[:4]
    mask = mask.at[:, ::4].set(False)  # some fully-empty neighborhoods
    xg = jax.vmap(lambda a, i: a[i])(x, idx)
    xg = xg.reshape(xg.shape[0], -1, xg.shape[-1])
    cot = jnp.asarray(np.random.default_rng(9).normal(
        size=(B, centroids.shape[1], LAYERS[-1])), jnp.float32)

    def loss(p, use_xg):
        out = sa_pallas.sa_neighborhood(
            p["conv_mlp"], LAYERS, x, pos, idx, mask, module.r, jax.nn.silu,
            rel=rel, xg=xg if use_xg else None)
        return jnp.sum(out * cot), out

    (_, dyn), g_dyn = jax.value_and_grad(loss, has_aux=True)(params, False)
    (_, stat), g_stat = jax.value_and_grad(loss, has_aux=True)(params, True)
    np.testing.assert_allclose(np.asarray(stat), np.asarray(dyn),
                               rtol=2e-5, atol=2e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                rtol=2e-4, atol=2e-4),
        g_stat, g_dyn)


def test_centroid_padding():
    # fraction picking a centroid count not divisible by the block size
    module, params, x, pos, neighbors = _setup(n=42, fraction=0.31)
    dense, _ = module.apply({"params": params}, x, pos, True, neighbors)
    fused = _fused(params, LAYERS, x, pos, neighbors, module.r)
    assert fused.shape == dense.shape
    np.testing.assert_allclose(np.asarray(fused), np.asarray(dense),
                               rtol=2e-5, atol=2e-5)


def test_pick_g_bwd_stash_cap():
    """Deep/wide conv stacks must shrink the block so the backward
    recompute stash fits scoped VMEM (regression: the MRG level stack
    64-128-256 at k=64 OOM'd the 16 MiB scoped limit at 4096 rows)."""
    # MRG failing shape: f_in=6, n_dims=2, widths 64+128+256 -> stash 456
    g = sa_pallas._pick_g(192, 64, 0, stash_floats=456)
    modeled = g * 64 * sa_pallas._BWD_BYTES_PER_STASH_FLOAT * 456
    assert modeled <= 16 << 20, (g, modeled)
    # observed on-chip cost at this stash: ~6280 B/row must also fit
    assert g * 64 * 6280 <= 16 << 20, (g, g * 64 * 6280)
    # narrow stacks keep the full 4096-row block (perf regression guard)
    assert sa_pallas._pick_g(925, 32, 0, stash_floats=138) * 32 == 4096
    # one-hot cap still binds independently of the stash cap
    assert (sa_pallas._pick_g(925, 8, n_src=2048, stash_floats=138) * 8
            <= max(512, sa_pallas.SA_ONEHOT_BYTES // (4 * 2048)) + 8)
