"""Analytic forward propagation of first/second spatial derivatives through
MLP stacks — the FLOP-optimal derivative path for pointwise PINN trunks.

Instead of nesting autodiff (vmapped vjp for the Jacobian + jvp-of-vjp for the
Laplacian ~= 12x forward FLOPs before the outer parameter gradient), propagate
the triple (value, J, H) through each layer with closed-form rules:

    Dense W,b:   v' = vW + b        J' = JW           H' = HW
    sigma(.):    v' = s(v)          J' = s'(v) J      H' = s''(v) J*J + s'(v) H
    dropout m:   all three scale by the same mask

where J, H have shape (..., N, D, F) holding d/dx_j and d^2/dx_j^2 per input
coordinate. For D spatial dims this costs (1 + 2D)x the forward matmuls
(5x for 2D) — every term is a large (N, F_in) x (F_in, F_out) matmul that
tiles straight onto the MXU — and leaves a graph the outer parameter gradient
traverses once.

Semantics note: this computes PER-POINT derivatives — the global pooled
context is treated as locally constant, which is the mathematically intended
PDE derivative. The torch reference's ``autograd.grad(sum(outputs))``
semantics (physics/operators.py) differ through the max-pool coupling:
its Jacobian picks up cross-point terms only at the argmax rows (the two
paths agree exactly elsewhere — tested), while its Laplacian carries an
additional mixed second-derivative term d^2 out_m / dx_m dx_argmax at every
row (small, O(1%) in practice — tested). The engine keeps the exact-autodiff
path as the default for reference parity and uses this one when a model opts
in (``fast_derivatives=True``).
"""
from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp


def tanh_rules(v):
    t = jnp.tanh(v)
    d1 = 1.0 - t * t
    return t, d1, -2.0 * t * d1


def silu_rules(v):
    s = jax.nn.sigmoid(v)
    ds = s * (1.0 - s)
    val = v * s
    d1 = s + v * ds
    d2 = 2.0 * ds + v * ds * (1.0 - 2.0 * s)
    return val, d1, d2


ACTIVATION_RULES: dict = {}


def _register_defaults():
    import flax.linen as nn
    ACTIVATION_RULES[nn.tanh] = tanh_rules
    ACTIVATION_RULES[jnp.tanh] = tanh_rules
    ACTIVATION_RULES[nn.silu] = silu_rules
    ACTIVATION_RULES[jax.nn.silu] = silu_rules


_register_defaults()


def identity_jacobian(points: jnp.ndarray):
    """(J0, H0) for raw coordinates: J = I per point, H = 0.
    points (..., N, D) -> J (..., N, D, D), H zeros."""
    d = points.shape[-1]
    eye = jnp.eye(d, dtype=points.dtype)
    j0 = jnp.broadcast_to(eye, (*points.shape[:-1], d, d))
    return j0, jnp.zeros_like(j0)


def constant_features(features: jnp.ndarray, n_dims: int):
    """(J, H) = 0 for inputs that are not differentiated (context channels)."""
    z = jnp.zeros((*features.shape[:-1], n_dims, features.shape[-1]),
                  features.dtype)
    return z, z


def concat_triples(triples: Sequence[tuple]):
    """Concatenate (v, J, H) triples along the feature axis."""
    v = jnp.concatenate([t[0] for t in triples], axis=-1)
    j = jnp.concatenate([t[1] for t in triples], axis=-1)
    h = jnp.concatenate([t[2] for t in triples], axis=-1)
    return v, j, h


def dense_prop(params: dict, v, j, h):
    """Propagate through a flax Dense layer's params {'kernel','bias'}."""
    w = params["kernel"]
    v = v @ w + params["bias"]
    j = j @ w
    h = h @ w
    return v, j, h


def activation_prop(act: Callable, v, j, h):
    rules = ACTIVATION_RULES.get(act)
    if rules is None:
        raise KeyError(
            f"no analytic derivative rules registered for activation {act}; "
            f"register in physics.analytic.ACTIVATION_RULES")
    val, d1, d2 = rules(v)
    d1e = d1[..., None, :]
    h = d2[..., None, :] * (j * j) + d1e * h
    j = d1e * j
    return val, j, h


def dropout_prop(rng, rate: float, v, j, h):
    """Inverted dropout with one mask shared by value and derivatives (the
    derivative of mask*x/keep is mask*dx/keep)."""
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, v.shape).astype(v.dtype) / keep
    return v * mask, j * mask[..., None, :], h * mask[..., None, :]


def mlp_prop(params: dict, layers: Sequence[int], v, j, h,
             activation: Callable,
             dropout: Optional[Sequence[float]] = None,
             last_activation: bool = True,
             deterministic: bool = True,
             rng=None):
    """Propagate (v, J, H) through an ``models.mlp.MLP`` parameter tree
    (layers/dropout/activation semantics identical to the module)."""
    n_out = len(layers) - 1
    for i in range(n_out):
        v, j, h = dense_prop(params[f"linear_{i}"], v, j, h)
        if i < n_out - 1 or last_activation:
            v, j, h = activation_prop(activation, v, j, h)
        if dropout is not None and dropout[i] > 0 and not deterministic:
            rng, sub = jax.random.split(rng)
            v, j, h = dropout_prop(sub, dropout[i], v, j, h)
    return v, j, h


def identity_jacobian_t(points: jnp.ndarray):
    """Transposed-layout (J0, H0) for raw coordinates: shape (..., D, N, D)
    with the derivative-component axis LEADING the point axis. This is the
    layout the fused TPU decoder kernel consumes directly (the component axis
    becomes a Pallas block dim — no transposes between the local feature
    chain and the kernel)."""
    d = points.shape[-1]
    n = points.shape[-2]
    eye = jnp.eye(d, dtype=points.dtype)            # (D, D)
    j0 = jnp.broadcast_to(eye[..., :, None, :],
                          (*points.shape[:-2], d, n, d))
    return j0, jnp.zeros_like(j0)


def mlp_prop_t(params: dict, layers: Sequence[int], v, jt, ht,
               activation: Callable, last_activation: bool = True):
    """``mlp_prop`` for the transposed derivative layout: ``v`` (..., N, F),
    ``jt``/``ht`` (..., D, N, F). Deterministic only (the hot paths that use
    it apply dropout downstream in the decoder)."""
    rules = ACTIVATION_RULES.get(activation)
    if rules is None:
        raise KeyError(
            f"no analytic derivative rules registered for activation "
            f"{activation}; register in physics.analytic.ACTIVATION_RULES")
    n_out = len(layers) - 1
    for i in range(n_out):
        p = params[f"linear_{i}"]
        w = p["kernel"]
        v = v @ w + p["bias"]
        jt = jt @ w
        ht = ht @ w
        if i < n_out - 1 or last_activation:
            val, d1, d2 = rules(v)
            d1e = d1[..., None, :, :]
            ht = d2[..., None, :, :] * (jt * jt) + d1e * ht
            jt = d1e * jt
            v = val
    return v, jt, ht


def context_dense_prop(params: dict, n_local: int, v, j, h, v_b, g,
                       j_ctx=None, h_ctx=None):
    """First dense layer of a decoder whose input is ``[local || context]``.

    The context block ``g`` (pooled geometry/branch embedding, shape
    (..., 1, G)) is constant per case: its J/H blocks are structural zeros and
    its value contribution is the same for every point. Splitting the kernel
    ``W = [W_l; W_g]`` therefore
      * computes ``g @ W_g`` ONCE per case instead of per point (for the
        reference envelope W_g is 16x wider than W_l — this removes ~94% of
        the first-layer value FLOPs), and
      * skips the J/H matmuls against the zero context block entirely
        (a 17x FLOP cut on the derivative rows).

    Exactly equivalent to ``dense_prop`` on the concatenated input (modulo
    float summation order). ``v_b`` (boundary/value-only rows) may be None.
    """
    w = params["kernel"]
    w_local = w[:n_local]
    w_ctx = w[n_local:]
    ctx = g @ w_ctx + params["bias"]  # (..., 1, F): once per case
    v = v @ w_local + ctx
    if v_b is not None:
        v_b = v_b @ w_local + ctx
    j_out = j @ w_local
    h_out = h @ w_local
    # Max-pool argmax coupling (see decoder_prop): the context block's input
    # derivatives are nonzero only at pooling-winner rows; when supplied they
    # flow through the context kernel block here and the standard activation
    # rules downstream produce the full true per-point (J, H) including the
    # D_gg / D_lg cross terms.
    if j_ctx is not None:
        j_out = j_out + j_ctx @ w_ctx
    if h_ctx is not None:
        h_out = h_out + h_ctx @ w_ctx
    return v, j_out, h_out, v_b


def activation_prop_merged(act: Callable, v, j, h, n_int: int):
    """Activation rules where ``v`` holds [internal || boundary] rows merged
    along the point axis (one matmul feeds both) while J/H only cover the
    first ``n_int`` (differentiated) rows."""
    rules = ACTIVATION_RULES.get(act)
    if rules is None:
        raise KeyError(
            f"no analytic derivative rules registered for activation {act}; "
            f"register in physics.analytic.ACTIVATION_RULES")
    val, d1, d2 = rules(v)
    d1i = d1[..., :n_int, None, :]
    h = d2[..., :n_int, None, :] * (j * j) + d1i * h
    j = d1i * j
    return val, j, h


def dropout_prop_merged(rng, rate: float, v, j, h, n_int: int):
    """One inverted-dropout mask over the merged rows; J/H share the mask of
    their corresponding internal rows (derivative of mask*x/keep)."""
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, v.shape).astype(v.dtype) / keep
    mask_i = mask[..., :n_int, None, :]
    return v * mask, j * mask_i, h * mask_i


def mlp_prop_merged(params: dict, layers: Sequence[int], v, j, h, n_int: int,
                    activation: Callable,
                    dropout: Optional[Sequence[float]] = None,
                    last_activation: bool = True,
                    deterministic: bool = True,
                    rng=None):
    """``mlp_prop`` over merged [internal || boundary] value rows: every
    layer's matmul feeds all rows, while J/H only cover the first ``n_int``
    (differentiated) rows, and one dropout mask spans the merged rows
    (matching the exact path's single concatenated forward). Untransposed
    layout: ``v`` (..., N, F), ``j``/``h`` (..., n_int, D, F)."""
    n_out = len(layers) - 1
    for i in range(n_out):
        v, j, h = dense_prop(params[f"linear_{i}"], v, j, h)
        if i < n_out - 1 or last_activation:
            v, j, h = activation_prop_merged(activation, v, j, h, n_int)
        if dropout is not None and dropout[i] > 0 and not deterministic:
            rng, sub = jax.random.split(rng)
            v, j, h = dropout_prop_merged(sub, dropout[i], v, j, h, n_int)
    return v, j, h


def decoder_prop(params: dict, layers: Sequence[int], n_local: int,
                 v, j, h, v_b, g,
                 activation: Callable,
                 dropout: Optional[Sequence[float]] = None,
                 last_activation: bool = False,
                 deterministic: bool = True,
                 rng=None,
                 j_ctx=None, h_ctx=None):
    """Fused decoder-stack propagation over ``[local || context]`` inputs.

    Combines three structural optimizations over a plain ``mlp_prop`` +
    separate boundary ``mlp_value`` (all exact, see ``context_dense_prop``):
      1. first-layer kernel split (per-case context contribution, zero-block
         J/H skip);
      2. internal-value and boundary-value rows merged into ONE row-stacked
         matmul per layer (better MXU tiling, one dispatch);
      3. a single dropout mask over the merged rows (matches the exact path,
         which draws one mask for the whole concatenated forward).

    :param v/j/h: internal local features + derivatives ((..., Ni, L),
        (..., Ni, D, L)); ``v_b``: boundary local features (..., Nb, L) or
        None; ``g``: pooled context (..., 1, G).
    :return: (values over [internal || boundary] rows, J, H).
    """
    n_int = v.shape[-2]
    v, j, h, v_b = context_dense_prop(params["linear_0"], n_local, v, j, h,
                                      v_b, g, j_ctx, h_ctx)
    if v_b is not None:
        v = jnp.concatenate([v, v_b], axis=-2)
    n_out = len(layers) - 1
    for i in range(n_out):
        if i > 0:
            p = params[f"linear_{i}"]
            w = p["kernel"]
            v = v @ w + p["bias"]
            j = j @ w
            h = h @ w
        if i < n_out - 1 or last_activation:
            v, j, h = activation_prop_merged(activation, v, j, h, n_int)
        if dropout is not None and dropout[i] > 0 and not deterministic:
            rng, sub = jax.random.split(rng)
            v, j, h = dropout_prop_merged(sub, dropout[i], v, j, h, n_int)
    return v, j, h


def mlp_value(params: dict, layers: Sequence[int], v,
              activation: Callable,
              dropout: Optional[Sequence[float]] = None,
              last_activation: bool = True,
              deterministic: bool = True,
              rng=None):
    """Value-only pass through the same parameter tree (for rows whose spatial
    derivatives are not needed, e.g. boundary points)."""
    n_out = len(layers) - 1
    for i in range(n_out):
        p = params[f"linear_{i}"]
        v = v @ p["kernel"] + p["bias"]
        if i < n_out - 1 or last_activation:
            v = activation(v)
        if dropout is not None and dropout[i] > 0 and not deterministic:
            rng, sub = jax.random.split(rng)
            keep = 1.0 - dropout[i]
            mask = jax.random.bernoulli(sub, keep, v.shape).astype(v.dtype)
            v = v * mask / keep
    return v
