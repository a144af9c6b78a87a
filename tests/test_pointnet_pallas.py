"""Fused Pallas PointNet-global kernel: parity with
``max over points of analytic.mlp_value`` (interpret mode) for outputs and
parameter/input gradients. Cotangent routing goes through the stored argmax —
the gradient test is what keeps the running (max, argmax) update honest."""
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from porous_cfd_tpu.ops import pointnet_pallas
from porous_cfd_tpu.physics import analytic

LAYERS = [16, 24, 32]


def make_params(seed=1):
    rng = np.random.default_rng(seed)
    params = {}
    for i in range(len(LAYERS) - 1):
        params[f"linear_{i}"] = {
            "kernel": jnp.asarray(
                rng.normal(size=(LAYERS[i], LAYERS[i + 1]))
                / np.sqrt(LAYERS[i]), jnp.float32),
            "bias": jnp.asarray(rng.normal(size=LAYERS[i + 1]) * 0.1,
                                jnp.float32)}
    return params


def ref_fn(params, x, act):
    g = analytic.mlp_value(params, LAYERS, x, act)
    return jnp.max(g, axis=-2, keepdims=True)


@pytest.mark.parametrize("act", [nn.silu, nn.tanh])
@pytest.mark.parametrize("b,n", [(2, 64), (1, 13), (3, 300)])
def test_forward_matches_reference(act, b, n):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(b, n, LAYERS[0])), jnp.float32)
    params = make_params()
    ref = ref_fn(params, x, act)
    out = pointnet_pallas.pointnet_global(params, LAYERS, x, act, tile=8,
                                          interpret=True)
    assert out.shape == (b, 1, LAYERS[-1])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_gradients_match_reference():
    act = nn.silu
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(2, 40, LAYERS[0])), jnp.float32)
    params = make_params()

    def loss(fn, p, xx):
        out = fn(p, xx)
        return jnp.sum(out ** 2) + jnp.sum(jnp.sin(out))

    ref_val, ref_grads = jax.value_and_grad(
        lambda p, xx: loss(lambda a, c: ref_fn(a, c, act), p, xx),
        argnums=(0, 1))(params, x)
    pl_val, pl_grads = jax.value_and_grad(
        lambda p, xx: loss(
            lambda a, c: pointnet_pallas.pointnet_global(
                a, LAYERS, c, act, tile=8, interpret=True), p, xx),
        argnums=(0, 1))(params, x)

    np.testing.assert_allclose(float(pl_val), float(ref_val), rtol=1e-5)
    flat_r, _ = jax.tree_util.tree_flatten(ref_grads)
    flat_p, _ = jax.tree_util.tree_flatten(pl_grads)
    assert len(flat_r) == len(flat_p)
    for r, p in zip(flat_r, flat_p):
        np.testing.assert_allclose(np.asarray(p), np.asarray(r), atol=5e-4,
                                   rtol=1e-3)


def test_multi_tile_max_crosses_tiles():
    """The running max must pick winners from any tile, and the backward must
    route cotangents to the right tile."""
    act = nn.tanh
    params = make_params(seed=3)
    rng = np.random.default_rng(4)
    # 5 tiles of 8 points; plant extreme inputs in the 4th tile
    x = np.asarray(rng.normal(size=(1, 40, LAYERS[0])), np.float32) * 0.1
    x[0, 27] = 3.0
    x = jnp.asarray(x)
    ref = ref_fn(params, x, act)
    out = pointnet_pallas.pointnet_global(params, LAYERS, x, act, tile=8,
                                          interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    g_ref = jax.grad(lambda xx: jnp.sum(ref_fn(params, xx, act) ** 2))(x)
    g_pl = jax.grad(lambda xx: jnp.sum(pointnet_pallas.pointnet_global(
        params, LAYERS, xx, act, tile=8, interpret=True) ** 2))(x)
    np.testing.assert_allclose(np.asarray(g_pl), np.asarray(g_ref), atol=5e-4)
