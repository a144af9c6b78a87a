"""Differential operators for PINN residuals, fused TPU-first.

The torch reference computes, per training step, 1 + D + D^2 separate
``autograd.grad`` graph replays with ``create_graph=True``
(``models/model_base.py:11-53``): a Jacobian row per velocity component, a
Laplacian entry per (component, dim) pair, and a pressure gradient.

Here the same quantities come out of ONE fused computation:

  * one forward pass,
  * one reverse (vjp) pass vmapped over the O output channels -> full Jacobian,
  * one forward-over-reverse (jvp of the linearized Jacobian) pass vmapped over
    the D input dims -> all diagonal second derivatives (Laplacian columns).

Semantics match the reference exactly: the torch code differentiates the *sum*
over points of each output channel (``grad_outputs=ones``), so cross-point
couplings through the global max-pool are included; the cotangent here is the
same all-ones-per-channel vector restricted to the differentiated rows.
The Laplacian entry equals a Hessian-vector product with the broadcast basis
vector e_j (identical to grad-of-jacobian-entry by symmetry of second
derivatives).
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def pinn_derivatives(apply_fn: Callable[[jnp.ndarray], jnp.ndarray],
                     points: jnp.ndarray,
                     compute_laplacian: bool = True):
    """Fused output/Jacobian/Laplacian computation.

    :param apply_fn: maps ``points (..., N, Din)`` to outputs ``(..., M, O)``
        with ``M >= N``. Only the first N output rows are differentiated (the
        reference differentiates the internal-subdomain outputs while the
        forward also produces boundary rows, ``models/model_base.py:188-196``).
    :param points: coordinates ``(..., N, Din)`` to differentiate w.r.t.
    :param compute_laplacian: skip the second-order pass when False.
    :return: ``(out, jac, lap)`` where ``out (..., M, O)`` is the full forward
        output, ``jac (..., N, O, Din)`` with ``jac[..., n, o, j] =
        d(sum_rows<N out[..., o]) / d points[..., n, j]`` and ``lap`` of the
        same shape holding the diagonal second derivatives
        ``d^2 / d points_j^2`` (None when disabled).
    """
    n = points.shape[-2]
    din = points.shape[-1]

    def jac_and_out(pts):
        out, vjp_fn = jax.vjp(apply_fn, pts)
        o_dim = out.shape[-1]
        eye = jnp.eye(o_dim, dtype=out.dtype)
        # Cotangent per channel: ones over the first n rows, zero elsewhere.
        row_mask = (jnp.arange(out.shape[-2]) < n).astype(out.dtype)[:, None]
        eye_exp = eye.reshape(o_dim, *(1,) * (out.ndim - 2), 1, o_dim)
        cots = jnp.broadcast_to(eye_exp * row_mask, (o_dim, *out.shape))
        jac = jax.vmap(lambda c: vjp_fn(c)[0])(cots)  # (O, ..., N, Din)
        return jac, out

    if not compute_laplacian:
        jac, out = jac_and_out(points)
        return out, jnp.moveaxis(jac, 0, -2), None

    (jac, out), lin = jax.linearize(jac_and_out, points)
    basis = jnp.eye(din, dtype=points.dtype)
    tangents = jnp.broadcast_to(
        basis[(slice(None),) + (None,) * (points.ndim - 1) + (slice(None),)],
        (din, *points.shape))
    lap_full, _ = jax.vmap(lin)(tangents)  # (Din, O, ..., N, Din)
    # Keep only the tangent-matching component j of each directional pass.
    lap = jnp.stack([lap_full[j, ..., j] for j in range(din)], axis=-1)
    jac = jnp.moveaxis(jac, 0, -2)          # (..., N, O, Din)
    lap = jnp.moveaxis(lap, 0, -2)          # (..., N, O, Din)
    return out, jac, lap


def split_derivatives(jac: jnp.ndarray, lap: jnp.ndarray | None, dims: int):
    """Split full-output derivatives into the quantities the losses consume.

    Output channel layout is [Ux, Uy, (Uz), p] (reference
    ``models/model_base.py:130-139``).

    :return: ``(u_jac (..., N, D, Din), u_lap or None, p_grad (..., N, Din))``.
    """
    u_jac = jac[..., :dims, :]
    p_grad = jac[..., dims, :]
    u_lap = None if lap is None else lap[..., :dims, :]
    return u_jac, u_lap, p_grad
