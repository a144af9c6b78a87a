"""Fused Pallas NeuralOperator-trunk kernel: parity with the XLA analytic
path (models/pi_gano.py:_neural_ops_prop_ctx + reduction dense_prop) for
outputs AND gradients — including the branch-embedding cotangent ``dpar``,
which the backward kernel accumulates from all three (v, J, H) streams."""
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from porous_cfd_tpu.models.pi_gano import _neural_ops_prop_ctx
from porous_cfd_tpu.ops import neural_op_pallas
from porous_cfd_tpu.physics import analytic

N_OPS = 3
L_LOC, L_GEOM, F, OUT = 12, 20, 32, 3
D = 2


def make_params(seed=1):
    rng = np.random.default_rng(seed)
    params = {}
    widths = [(L_LOC + L_GEOM, F)] + [(F, F)] * (N_OPS - 1)
    trunk = {}
    for i, (a, b) in enumerate(widths):
        trunk[f"operator_{i}"] = {"Dense_0": {
            "kernel": jnp.asarray(rng.normal(size=(a, b)) / np.sqrt(a),
                                  jnp.float32),
            "bias": jnp.asarray(rng.normal(size=b) * 0.1, jnp.float32)}}
    params["neural_ops"] = trunk
    params["reduction"] = {
        "kernel": jnp.asarray(rng.normal(size=(F, OUT)) / np.sqrt(F),
                              jnp.float32),
        "bias": jnp.asarray(rng.normal(size=OUT) * 0.1, jnp.float32)}
    return params


def make_inputs(b=2, ni=24, nb=16, seed=0):
    rng = np.random.default_rng(seed)
    f = lambda *s: jnp.asarray(rng.normal(size=s), jnp.float32) * 0.5
    return (f(b, ni, L_LOC), f(b, ni, D, L_LOC), f(b, ni, D, L_LOC),
            f(b, nb, L_LOC), f(b, 1, L_GEOM), f(b, 1, F))


def ref_path(params, inputs, act, last_activation=True):
    lv, lj, lh, lv_b, geom, par = inputs
    v, j, h = _neural_ops_prop_ctx(
        params["neural_ops"], N_OPS, (0.0,) * N_OPS, act, last_activation,
        lv, lj, lh, lv_b, geom, par, True, None, analytic)
    out, j, h = analytic.dense_prop(params["reduction"], v, j, h)
    return out, jnp.swapaxes(j, -1, -2), jnp.swapaxes(h, -1, -2)


def kernel_path(params, inputs, act, tile=8, last_activation=True):
    lv, lj, lh, lv_b, geom, par = inputs
    ljt, lht = jnp.swapaxes(lj, -3, -2), jnp.swapaxes(lh, -3, -2)
    return neural_op_pallas.neural_ops_prop(
        params["neural_ops"], N_OPS, L_LOC, lv, ljt, lht, lv_b, geom, par,
        act, (0.0,) * N_OPS, last_activation, params["reduction"],
        tile=tile, interpret=True)


@pytest.mark.parametrize("act", [nn.silu, nn.tanh])
def test_forward_matches_reference(act):
    params = make_params()
    inputs = make_inputs()
    ref = ref_path(params, inputs, act)
    out = kernel_path(params, inputs, act)
    for r, o, name in zip(ref, out, ("v", "jac", "lap")):
        np.testing.assert_allclose(np.asarray(o), np.asarray(r), atol=2e-5,
                                   err_msg=f"component {name}")


def test_odd_point_counts_and_no_boundary():
    act = nn.tanh
    params = make_params(seed=3)
    inputs = make_inputs(b=1, ni=13, nb=5, seed=4)
    ref = ref_path(params, inputs, act)
    out = kernel_path(params, inputs, act)
    for r, o in zip(ref, out):
        np.testing.assert_allclose(np.asarray(o), np.asarray(r), atol=2e-5)

    lv, lj, lh, _, geom, par = inputs
    ljt, lht = jnp.swapaxes(lj, -3, -2), jnp.swapaxes(lh, -3, -2)
    ov, _, _ = neural_op_pallas.neural_ops_prop(
        params["neural_ops"], N_OPS, L_LOC, lv, ljt, lht, None, geom, par,
        act, (0.0,) * N_OPS, True, params["reduction"], tile=8,
        interpret=True)
    np.testing.assert_allclose(np.asarray(ov), np.asarray(ref[0])[:, :13],
                               atol=2e-5)


def test_gradients_match_reference():
    """Parameter + input + geom + par gradients through a loss touching all
    three outputs with distinct weights."""
    act = nn.silu
    params = make_params()
    inputs = make_inputs()

    def loss(path, p, i):
        ov, oj, oh = path(p, i, act)
        return (jnp.sum(ov ** 2) + 2.0 * jnp.sum(jnp.sin(oj))
                + 0.5 * jnp.sum(oh ** 2))

    ref_val, ref_grads = jax.value_and_grad(
        lambda p, i: loss(ref_path, p, i), argnums=(0, 1))(params, inputs)
    pl_val, pl_grads = jax.value_and_grad(
        lambda p, i: loss(kernel_path, p, i), argnums=(0, 1))(params, inputs)

    np.testing.assert_allclose(float(pl_val), float(ref_val), rtol=1e-5)
    flat_r, _ = jax.tree_util.tree_flatten(ref_grads)
    flat_p, _ = jax.tree_util.tree_flatten(pl_grads)
    assert len(flat_r) == len(flat_p)
    for r, p in zip(flat_r, flat_p):
        np.testing.assert_allclose(np.asarray(p), np.asarray(r), atol=5e-4,
                                   rtol=1e-3)


def test_dropout_determinism_and_mask_consistency():
    """Same rng -> identical outputs; forward/backward share masks (finite
    difference on a trunk bias agrees with autodiff under active dropout)."""
    act = nn.silu
    params = make_params()
    lv, lj, lh, lv_b, geom, par = make_inputs(b=1, ni=16, nb=8)
    ljt, lht = jnp.swapaxes(lj, -3, -2), jnp.swapaxes(lh, -3, -2)
    rng = jax.random.PRNGKey(7)

    def run(p):
        return neural_op_pallas.neural_ops_prop(
            p["neural_ops"], N_OPS, L_LOC, lv, ljt, lht, lv_b, geom, par,
            act, (0.5, 0.0, 0.0), True, p["reduction"],
            deterministic=False, rng=rng, tile=8, interpret=True)

    try:
        ov, _, _ = run(params)
    except Exception as e:  # pragma: no cover - interpreter PRNG support
        pytest.skip(f"pallas interpret-mode PRNG unavailable: {e}")
    ov2, _, _ = run(params)
    np.testing.assert_array_equal(np.asarray(ov), np.asarray(ov2))
    det = kernel_path(params, (lv, lj, lh, lv_b, geom, par), act)[0]
    assert np.abs(np.asarray(ov) - np.asarray(det)).max() > 1e-4

    def scalar(p):
        o, _, _ = run(p)
        return jnp.sum(o ** 2)

    gr = jax.grad(scalar)(params)
    eps = 1e-3
    pp = jax.tree_util.tree_map(lambda x: x, params)
    b0 = params["neural_ops"]["operator_1"]["Dense_0"]["bias"]
    pp["neural_ops"] = dict(params["neural_ops"])
    pp["neural_ops"]["operator_1"] = {"Dense_0": {
        "kernel": params["neural_ops"]["operator_1"]["Dense_0"]["kernel"],
        "bias": b0.at[0].add(eps)}}
    fd = (float(scalar(pp)) - float(scalar(params))) / eps
    ad = float(gr["neural_ops"]["operator_1"]["Dense_0"]["bias"][0])
    assert abs(fd - ad) < 5e-2 * max(1.0, abs(ad))
