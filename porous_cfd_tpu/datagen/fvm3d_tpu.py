"""TPU-batched 3D Navier-Stokes + Darcy-Forchheimer solver.

Same discretization as ``datagen/fvm3d.py`` (staggered MAC grid, central
convection with a small upwind blend, implicit porous sink, explicit
pseudo-time projection), re-expressed in JAX so a whole ZOO of cases marches
as ONE batched ``lax.while_loop`` on the TPU:

  * the Kronecker-sum pressure Poisson operator is solved in its eigenbasis —
    three small symmetric-tridiagonal eigendecompositions (numpy, at setup)
    turn every projection into six dense matmuls over the (B, nx, ny, nz)
    field plus an eigenvalue divide, which is exactly MXU-shaped;
  * all cases advance in lockstep; converged cases are frozen (masked
    updates) until the whole batch is done, with per-case residuals/steps.

Motivation (round 4): the numpy solver needs ~2-6 min/case on this host's
single CPU core — a 150-case zoo is ~10 h of wall clock. The batched TPU
march generates the same zoo in minutes, with fields validated against the
numpy reference solver (tests/test_fvm3d_tpu.py).

Float32 note: the march runs f32 (TPU-native); the numpy reference is f64.
Agreement on the final steady fields is ~1e-4 relative — far below the
surrogate-training signal — and the convergence tolerance (2e-4 on the
normalized update) sits above the f32 noise floor (~4e-5 at the default dt).
"""
from __future__ import annotations

import numpy as np

from porous_cfd_tpu.datagen import fvm3d
from porous_cfd_tpu.datagen.fvm3d import DOMAIN3, DuctSolution3, NU


def _poisson_eig(n: int, h: float, dirichlet_end: bool):
    """Dense symmetric 1D second-difference operator -> (Q, lam) with
    A = Q diag(lam) Q^T (same stencil as fvm3d._poisson_1d)."""
    a = 1.0 / h ** 2
    A = np.zeros((n, n))
    A[np.arange(n), np.arange(n)] = -2.0 * a
    A[0, 0] = -a
    A[n - 1, n - 1] = -3.0 * a if dirichlet_end else -a
    idx = np.arange(n - 1)
    A[idx, idx + 1] = a
    A[idx + 1, idx] = a
    lam, Q = np.linalg.eigh(A)
    return Q, lam


def solve_duct3_batch(cases, nx: int = 48, ny: int = 28, nz: int = 28,
                      nu: float = NU, d: float = fvm3d.DARCY_D,
                      f: float = fvm3d.FORCH_F, tol: float = 1e-4,
                      max_steps: int = 20000, upwind: float = 0.15):
    """March a batch of 3D duct cases to steady state on the default JAX
    device.

    :param cases: sequence of (shape, center, size, u_inlet) tuples
        (``tools/train_golden_3d.zoo_cases`` draw format).
    :return: list of ``fvm3d.DuctSolution3`` (cell-centred numpy fields,
        per-case residual/steps), matching ``fvm3d.solve_duct3`` output.
    """
    import jax
    import jax.numpy as jnp

    B = len(cases)
    (x0, x1), (y0, y1), (z0, z1) = DOMAIN3
    dx = (x1 - x0) / nx
    dy = (y1 - y0) / ny
    dz = (z1 - z0) / nz
    xc = x0 + (np.arange(nx) + 0.5) * dx
    yc = y0 + (np.arange(ny) + 0.5) * dy
    zc = z0 + (np.arange(nz) + 0.5) * dz
    xu = x0 + np.arange(nx + 1) * dx
    yv = y0 + np.arange(ny + 1) * dy
    zw = z0 + np.arange(nz + 1) * dz

    su = np.empty((B, nx + 1, ny, nz), np.float32)
    sv = np.empty((B, nx, ny + 1, nz), np.float32)
    sw = np.empty((B, nx, ny, nz + 1), np.float32)
    zone = np.empty((B, nx, ny, nz), np.float32)
    u_in = np.empty((B,), np.float32)
    for i, (shape, center, size, u_inlet) in enumerate(cases):
        inside = fvm3d.shape_indicator3(shape, center, size)

        def mask(xs, ys, zs):
            xx, yy, zz = np.meshgrid(xs, ys, zs, indexing="ij")
            return inside(xx, yy, zz).astype(np.float32)

        su[i], sv[i], sw[i] = mask(xu, yc, zc), mask(xc, yv, zc), mask(
            xc, yc, zw)
        zone[i] = mask(xc, yc, zc)
        u_in[i] = u_inlet

    dt = 0.35 * np.minimum(dx / np.maximum(u_in * 3.0, 1e-9),
                           dx * dx / (6.0 * nu)).astype(np.float32)
    dt4 = dt[:, None, None, None]

    Qx, lx = _poisson_eig(nx, dx, dirichlet_end=True)
    Qy, ly = _poisson_eig(ny, dy, dirichlet_end=False)
    Qz, lz = _poisson_eig(nz, dz, dirichlet_end=False)
    lam = (lx[:, None, None] + ly[None, :, None]
           + lz[None, None, :]).astype(np.float32)
    Qx, Qy, Qz = (a.astype(np.float32) for a in (Qx, Qy, Qz))

    def avg(a, axis):
        axis += 1
        lo = tuple(slice(0, a.shape[ax] - 1) if ax == axis else slice(None)
                   for ax in range(a.ndim))
        hi = tuple(slice(1, a.shape[ax]) if ax == axis else slice(None)
                   for ax in range(a.ndim))
        return 0.5 * (a[lo] + a[hi])

    def diff(a, axis, h):
        axis += 1
        lo = tuple(slice(0, a.shape[ax] - 1) if ax == axis else slice(None)
                   for ax in range(a.ndim))
        hi = tuple(slice(1, a.shape[ax]) if ax == axis else slice(None)
                   for ax in range(a.ndim))
        return (a[hi] - a[lo]) / h

    def even(a, axis):
        axis += 1
        lo = tuple(slice(0, 1) if ax == axis else slice(None)
                   for ax in range(a.ndim))
        hi = tuple(slice(a.shape[ax] - 1, a.shape[ax]) if ax == axis
                   else slice(None) for ax in range(a.ndim))
        return jnp.concatenate([a[lo], a, a[hi]], axis=axis)

    def cd_u(u, v, w):
        uc = avg(u, 0)
        uu = uc * uc
        uw_ = jnp.where(uc >= 0, u[:, :-1], u[:, 1:])
        duu = diff((1 - upwind) * uu + upwind * uc * uw_, 0, dx)

        ug_y = even(u, 1)[:, 1:-1]
        u_ey = avg(ug_y, 1)
        v_ey = avg(v, 0)
        duv = diff(v_ey * u_ey, 1, dy)

        ug_z = even(u, 2)[:, 1:-1]
        u_ez = avg(ug_z, 2)
        w_ez = avg(w, 0)
        duw = diff(w_ez * u_ez, 2, dz)

        lap = (u[:, 2:] - 2 * u[:, 1:-1] + u[:, :-2]) / dx ** 2
        lap = lap + (ug_y[:, :, 2:] - 2 * ug_y[:, :, 1:-1]
                     + ug_y[:, :, :-2]) / dy ** 2
        lap = lap + (ug_z[:, :, :, 2:] - 2 * ug_z[:, :, :, 1:-1]
                     + ug_z[:, :, :, :-2]) / dz ** 2
        return -(duu + duv + duw) + nu * lap

    def cd_v(u, v, w):
        vc = avg(v, 1)
        vv = vc * vc
        vw_ = jnp.where(vc >= 0, v[:, :, :-1], v[:, :, 1:])
        dvv = diff((1 - upwind) * vv + upwind * vc * vw_, 1, dy)

        vg_x = jnp.concatenate([-v[:, :1], v, v[:, -1:]], axis=1)
        v_ex = avg(vg_x, 0)[:, :, 1:-1]
        u_ex = avg(u, 1)
        duv = diff(u_ex * v_ex, 0, dx)

        vg_z = even(v, 2)
        v_ez = avg(vg_z, 2)[:, :, 1:-1]
        w_ez = avg(w, 1)
        dwv = diff(w_ez * v_ez, 2, dz)

        lap = (v[:, :, 2:] - 2 * v[:, :, 1:-1] + v[:, :, :-2]) / dy ** 2
        lap = lap + (vg_x[:, 2:, 1:-1] - 2 * vg_x[:, 1:-1, 1:-1]
                     + vg_x[:, :-2, 1:-1]) / dx ** 2
        lap = lap + (vg_z[:, :, 1:-1, 2:] - 2 * vg_z[:, :, 1:-1, 1:-1]
                     + vg_z[:, :, 1:-1, :-2]) / dz ** 2
        return -(dvv + duv + dwv) + nu * lap

    def cd_w(u, v, w):
        wc = avg(w, 2)
        ww = wc * wc
        ww_up = jnp.where(wc >= 0, w[:, :, :, :-1], w[:, :, :, 1:])
        dww = diff((1 - upwind) * ww + upwind * wc * ww_up, 2, dz)

        wg_x = jnp.concatenate([-w[:, :1], w, w[:, -1:]], axis=1)
        w_ex = avg(wg_x, 0)[:, :, :, 1:-1]
        u_ex = avg(u, 2)
        duw = diff(u_ex * w_ex, 0, dx)

        wg_y = even(w, 1)
        w_ey = avg(wg_y, 1)[:, :, :, 1:-1]
        v_ey = avg(v, 2)
        dvw = diff(v_ey * w_ey, 1, dy)

        lap = (w[:, :, :, 2:] - 2 * w[:, :, :, 1:-1]
               + w[:, :, :, :-2]) / dz ** 2
        lap = lap + (wg_x[:, 2:, :, 1:-1] - 2 * wg_x[:, 1:-1, :, 1:-1]
                     + wg_x[:, :-2, :, 1:-1]) / dx ** 2
        lap = lap + (wg_y[:, :, 2:, 1:-1] - 2 * wg_y[:, :, 1:-1, 1:-1]
                     + wg_y[:, :, :-2, 1:-1]) / dy ** 2
        return -(dww + duw + dvw) + nu * lap

    def poisson(b):
        # eigenbasis solve of the Kronecker-sum operator, batched over cases
        t = jnp.einsum("xi,bxyz->biyz", Qx, b)
        t = jnp.einsum("yj,biyz->bijz", Qy, t)
        t = jnp.einsum("zk,bijz->bijk", Qz, t)
        t = t / lam
        t = jnp.einsum("zk,bijk->bijz", Qz, t)
        t = jnp.einsum("yj,bijz->biyz", Qy, t)
        return jnp.einsum("xi,biyz->bxyz", Qx, t)

    su_j, sv_j, sw_j = jnp.asarray(su), jnp.asarray(sv), jnp.asarray(sw)
    dt_j = jnp.asarray(dt4)
    uin_j = jnp.asarray(u_in)[:, None, None]

    def body(state):
        u, v, w, p, res, steps, done = state
        s_u = (nu * d + 0.5 * f * jnp.abs(u[:, 1:-1])) * su_j[:, 1:-1]
        s_v = (nu * d + 0.5 * f * jnp.abs(v[:, :, 1:-1])) * sv_j[:, :, 1:-1]
        s_w = (nu * d
               + 0.5 * f * jnp.abs(w[:, :, :, 1:-1])) * sw_j[:, :, :, 1:-1]

        rhs_u = cd_u(u, v, w) - diff(p, 0, dx)
        rhs_v = cd_v(u, v, w) - diff(p, 1, dy)
        rhs_w = cd_w(u, v, w) - diff(p, 2, dz)

        u_star = u.at[:, 1:-1].set((u[:, 1:-1] + dt_j * rhs_u)
                                   / (1.0 + dt_j * s_u))
        v_star = v.at[:, :, 1:-1].set((v[:, :, 1:-1] + dt_j * rhs_v)
                                      / (1.0 + dt_j * s_v))
        w_star = w.at[:, :, :, 1:-1].set((w[:, :, :, 1:-1] + dt_j * rhs_w)
                                         / (1.0 + dt_j * s_w))
        u_star = u_star.at[:, 0].set(uin_j)
        u_star = u_star.at[:, -1].set(u_star[:, -2])
        v_star = v_star.at[:, :, 0].set(0.0)
        v_star = v_star.at[:, :, -1].set(0.0)
        w_star = w_star.at[:, :, :, 0].set(0.0)
        w_star = w_star.at[:, :, :, -1].set(0.0)

        div = (diff(u_star, 0, dx) + diff(v_star, 1, dy)
               + diff(w_star, 2, dz))
        phi = poisson(div / dt_j)

        u_new = u_star.at[:, 1:-1].add(-dt_j * diff(phi, 0, dx))
        u_new = u_new.at[:, -1].add(-dt_j[:, 0] * (0.0 - phi[:, -1])
                                    * 2.0 / dx)
        v_new = v_star.at[:, :, 1:-1].add(-dt_j * diff(phi, 1, dy))
        w_new = w_star.at[:, :, :, 1:-1].add(-dt_j * diff(phi, 2, dz))
        p_new = p + phi

        p_scale = jnp.maximum(0.5 * uin_j[:, 0, 0] ** 2,
                              jnp.max(jnp.abs(p_new), axis=(1, 2, 3)))
        dtb = dt_j[:, :, 0, 0]
        res_new = jnp.maximum(
            jnp.max(jnp.abs(u_new - u), axis=(1, 2, 3))
            / (dtb[:, 0] * jnp.asarray(u_in)),
            jnp.max(jnp.abs(phi), axis=(1, 2, 3)) / (dtb[:, 0] * p_scale))

        frz = done[:, None, None, None]
        u = jnp.where(frz, u, u_new)
        v = jnp.where(frz, v, v_new)
        w = jnp.where(frz, w, w_new)
        p = jnp.where(frz, p, p_new)
        res = jnp.where(done, res, res_new)
        steps = steps + jnp.where(done, 0, 1)
        done = done | (res_new < tol)
        return u, v, w, p, res, steps, done

    def cond(state):
        *_, steps, done = state
        return (~jnp.all(done)) & (jnp.max(steps) < max_steps)

    import jax

    u0 = jnp.broadcast_to(uin_j[:, :, None],
                          (B, nx + 1, ny, nz)).astype(jnp.float32)
    state0 = (u0, jnp.zeros((B, nx, ny + 1, nz), jnp.float32),
              jnp.zeros((B, nx, ny, nz + 1), jnp.float32),
              jnp.zeros((B, nx, ny, nz), jnp.float32),
              jnp.full((B,), jnp.inf, jnp.float32),
              jnp.zeros((B,), jnp.int32),
              jnp.zeros((B,), bool))

    run = jax.jit(lambda s: jax.lax.while_loop(cond, body, s))
    u, v, w, p, res, steps, done = (np.asarray(a) for a in run(state0))

    sols = []
    for i in range(B):
        uc = 0.5 * (u[i, :-1] + u[i, 1:])
        vc = 0.5 * (v[i][:, :-1] + v[i][:, 1:])
        wc = 0.5 * (w[i][..., :-1] + w[i][..., 1:])
        div_c = ((u[i, 1:] - u[i, :-1]) / dx
                 + (v[i][:, 1:] - v[i][:, :-1]) / dy
                 + (w[i][..., 1:] - w[i][..., :-1]) / dz)
        uc64, vc64, wc64, p64 = (a.astype(np.float64)
                                 for a in (uc, vc, wc, p[i]))
        merr = fvm3d._momentum_residual3(uc64, vc64, wc64, p64, zone[i],
                                         (dx, dy, dz), nu, d, f)
        sols.append(DuctSolution3(
            xc, yc, zc, uc64, vc64, wc64, p64, zone[i].astype(np.float64),
            div_c.astype(np.float64), merr, float(res[i]), int(steps[i])))
    return sols
