"""Gradient-correctness tests for the fused derivative operator — the highest
risk surface of the rebuild (SURVEY.md section 7 'hard parts' #1)."""
import jax
import jax.numpy as jnp
import numpy as np

from porous_cfd_tpu.physics.operators import pinn_derivatives, split_derivatives


def analytic_apply(pts):
    """Pointwise analytic function with known derivatives: outputs
    [sin(y)cos(x), -sin(x)cos(y), p] (the manufactured solution)."""
    x, y = pts[..., 0], pts[..., 1]
    ux = jnp.sin(y) * jnp.cos(x)
    uy = -jnp.sin(x) * jnp.cos(y)
    p = -0.25 * (jnp.cos(2 * x) + jnp.cos(2 * y))
    return jnp.stack([ux, uy, p], axis=-1)


def test_jacobian_matches_analytic():
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.uniform(0, 2 * np.pi, size=(2, 50, 2)), jnp.float32)
    out, jac, lap = pinn_derivatives(analytic_apply, pts)

    x, y = np.asarray(pts[..., 0]), np.asarray(pts[..., 1])
    # jac[..., o, j] = d out_o / d x_j
    expect = np.zeros((2, 50, 3, 2), np.float32)
    expect[..., 0, 0] = -np.sin(y) * np.sin(x)
    expect[..., 0, 1] = np.cos(y) * np.cos(x)
    expect[..., 1, 0] = -np.cos(x) * np.cos(y)
    expect[..., 1, 1] = np.sin(x) * np.sin(y)
    expect[..., 2, 0] = 0.5 * np.sin(2 * x)
    expect[..., 2, 1] = 0.5 * np.sin(2 * y)
    np.testing.assert_allclose(jac, expect, atol=2e-5)


def test_laplacian_matches_analytic():
    rng = np.random.default_rng(1)
    pts = jnp.asarray(rng.uniform(0, 2 * np.pi, size=(1, 40, 2)), jnp.float32)
    out, jac, lap = pinn_derivatives(analytic_apply, pts)

    x, y = np.asarray(pts[..., 0]), np.asarray(pts[..., 1])
    expect = np.zeros((1, 40, 3, 2), np.float32)
    expect[..., 0, 0] = -np.sin(y) * np.cos(x)   # d2ux/dx2
    expect[..., 0, 1] = -np.sin(y) * np.cos(x)   # d2ux/dy2
    expect[..., 1, 0] = np.sin(x) * np.cos(y)
    expect[..., 1, 1] = np.sin(x) * np.cos(y)
    expect[..., 2, 0] = np.cos(2 * x)
    expect[..., 2, 1] = np.cos(2 * y)
    np.testing.assert_allclose(lap, expect, atol=3e-5)


def _finite_difference_reference(apply_fn, pts, n_rows, eps=1e-3, lap_eps=5e-2):
    """FD of sum over the first n_rows of each output channel (the exact torch
    semantics: grad_outputs=ones on the internal rows). The second-order
    difference uses a larger step to stay above float32 roundoff."""
    pts = np.asarray(pts, np.float64)
    out0 = np.asarray(apply_fn(jnp.asarray(pts, jnp.float32)), np.float64)
    o_dim = out0.shape[-1]
    s_0 = out0[..., :n_rows, :].sum(axis=tuple(range(out0.ndim - 1)))
    jac = np.zeros((*pts.shape[:-1], o_dim, pts.shape[-1]))
    lap = np.zeros_like(jac)

    def channel_sums(p):
        o = np.asarray(apply_fn(jnp.asarray(p, jnp.float32)), np.float64)
        return o[..., :n_rows, :].sum(axis=tuple(range(o.ndim - 1)))

    for idx in np.ndindex(*pts.shape[:-1]):
        for j in range(pts.shape[-1]):
            dp, dm = pts.copy(), pts.copy()
            dp[(*idx, j)] += eps
            dm[(*idx, j)] -= eps
            jac[(*idx, slice(None), j)] = (channel_sums(dp) - channel_sums(dm)) / (2 * eps)
            dp, dm = pts.copy(), pts.copy()
            dp[(*idx, j)] += lap_eps
            dm[(*idx, j)] -= lap_eps
            lap[(*idx, slice(None), j)] = (
                channel_sums(dp) - 2 * s_0 + channel_sums(dm)) / lap_eps ** 2
    return jac, lap


def test_matches_finite_differences_with_global_pooling():
    """A network with a global mean-pool couples points; verify the operator
    reproduces the summed-cotangent semantics including cross-point terms."""
    rng = np.random.default_rng(2)
    w1 = jnp.asarray(rng.normal(size=(2, 8)) * 0.5, jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(16, 3)) * 0.5, jnp.float32)

    def apply_fn(pts):
        h = jnp.tanh(pts @ w1)                        # (B,N,8)
        g = jnp.mean(h, axis=-2, keepdims=True)       # smooth global pooling
        g = jnp.broadcast_to(g, h.shape)
        return jnp.concatenate([h, g], axis=-1) @ w2  # (B,N,3)

    pts = jnp.asarray(rng.uniform(-1, 1, size=(1, 5, 2)), jnp.float32)
    out, jac, lap = pinn_derivatives(apply_fn, pts)
    fd_jac, fd_lap = _finite_difference_reference(apply_fn, pts, n_rows=5)
    np.testing.assert_allclose(jac, fd_jac, atol=2e-3)
    np.testing.assert_allclose(lap, fd_lap, atol=5e-2)


def test_row_restricted_cotangent():
    """Only the first N rows (internal) are differentiated even when apply_fn
    returns extra (boundary) rows."""
    rng = np.random.default_rng(3)
    w = jnp.asarray(rng.normal(size=(2, 3)), jnp.float32)
    extra = jnp.asarray(rng.uniform(-1, 1, size=(1, 4, 2)), jnp.float32)

    def apply_fn(pts):
        allp = jnp.concatenate([pts, extra], axis=-2)
        return jnp.sin(allp @ w)

    pts = jnp.asarray(rng.uniform(-1, 1, size=(1, 6, 2)), jnp.float32)
    out, jac, lap = pinn_derivatives(apply_fn, pts)
    assert out.shape == (1, 10, 3)
    assert jac.shape == (1, 6, 3, 2)
    fd_jac, fd_lap = _finite_difference_reference(apply_fn, pts, n_rows=6)
    np.testing.assert_allclose(jac, fd_jac, atol=2e-3)
    np.testing.assert_allclose(lap, fd_lap, atol=5e-2)


def test_split_derivatives():
    jac = jnp.arange(2 * 4 * 3 * 2, dtype=jnp.float32).reshape(2, 4, 3, 2)
    u_jac, u_lap, p_grad = split_derivatives(jac, jac * 2, dims=2)
    assert u_jac.shape == (2, 4, 2, 2)
    np.testing.assert_allclose(p_grad, jac[..., 2, :])
    np.testing.assert_allclose(u_lap, jac[..., :2, :] * 2)
