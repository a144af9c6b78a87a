"""TPU-batched 2D Navier-Stokes + Darcy-Forchheimer solver.

Same discretization as ``datagen/fvm.py`` (staggered MAC grid, central
convection with a small upwind blend, implicit porous sink, explicit
pseudo-time incremental projection), re-expressed in JAX so a whole transform
GRID of cases marches as ONE batched ``lax.while_loop`` on the TPU:

  * the 5-point pressure-Poisson operator of ``fvm._poisson_matrix`` is a
    Kronecker sum A = Ax (+) Ay (Neumann walls/inlet, Dirichlet outlet face),
    so every projection is four dense (nx, nx)/(ny, ny) matmuls over the
    (B, nx, ny) divergence field plus an eigenvalue divide — MXU-shaped,
    replacing the per-case prefactorized sparse solve;
  * all cases advance in lockstep with per-case dt / inlet / coefficients
    (the duct_variable_boundary protocol's anisotropic d, per-case f, and
    angled inlets are batch axes); converged cases are frozen (masked
    updates) until the whole batch is done, with per-case residuals/steps.

Motivation (round 4): the numpy solver needs ~18 s/case on this host's single
CPU core — the reference-scale 621-case transform grid
(``/root/reference/examples/duct_fixed_boundary/assets/meshes/standard/
transforms.json``) is ~3 h of wall clock, and the variable-coefficient grid
(``/root/reference/examples/duct_variable_boundary/generator_2d_variable.py:
15-100``) another ~3 h. The batched TPU march generates either in minutes.

Precision: the march defaults to float32 (TPU-native); the numpy reference is
float64. The discretization is IDENTICAL — with ``dtype=float64`` on CPU the
batched march reproduces ``fvm.solve_duct`` to roundoff
(tests/test_fvm_tpu.py) — so the f32 production mode differs from the numpy
fields only by accumulation noise (~1e-4 relative on the steady fields, far
below the <5% surrogate target). The convergence tolerance should stay at or
above ~2e-4 in f32 (the update-norm noise floor); the grid writers persist
the solver mode, per-case achieved residual and step count into each case's
``solver.json`` (tools/golden_transform_grid.py ``solve_cases`` →
``synthetic_case.write_case``), so batch-f32 and numpy-f64 datasets stay
distinguishable on disk (ADVICE r4).
"""
from __future__ import annotations

import numpy as np

from porous_cfd_tpu.datagen import fvm
from porous_cfd_tpu.datagen.fvm import DOMAIN, DuctSolution, NU
from porous_cfd_tpu.datagen.fvm3d_tpu import _poisson_eig


def solve_duct_batch(cases, nx: int = 120, ny: int = 72, nu: float = NU,
                     tol: float = 2e-4, max_steps: int = 30000,
                     upwind: float = 0.1, dtype=None):
    """March a batch of 2D duct cases to steady state on the default JAX
    device.

    :param cases: sequence of dicts with ``fvm.solve_duct`` geometry/BC
        parameters: ``shape``, ``cx``, ``cy``, ``size``, ``theta`` (radians),
        and optional ``sx``, ``sy``, ``u_inlet``, ``v_inlet``, ``d`` (scalar
        or (dx, dy) pair), ``f``.
    :param dtype: march precision (default ``jnp.float32``; pass
        ``jnp.float64`` with x64 enabled to reproduce the numpy solver
        bit-for-bit up to roundoff).
    :return: list of ``fvm.DuctSolution`` (cell-centred float64 fields,
        per-case residual/steps), matching ``fvm.solve_duct`` output.
    """
    import jax
    import jax.numpy as jnp

    if dtype is None:
        dtype = jnp.float32
    B = len(cases)
    (x0, x1), (y0, y1) = DOMAIN
    dx = (x1 - x0) / nx
    dy = (y1 - y0) / ny
    xc = x0 + (np.arange(nx) + 0.5) * dx
    yc = y0 + (np.arange(ny) + 0.5) * dy
    xu = x0 + np.arange(nx + 1) * dx
    yv = y0 + np.arange(ny + 1) * dy

    su = np.empty((B, nx + 1, ny), np.float64)
    sv = np.empty((B, nx, ny + 1), np.float64)
    zone = np.empty((B, nx, ny), np.float64)
    u_in = np.empty((B,), np.float64)
    v_in = np.empty((B,), np.float64)
    d_x = np.empty((B,), np.float64)
    d_y = np.empty((B,), np.float64)
    f_c = np.empty((B,), np.float64)
    for i, case in enumerate(cases):
        inside = fvm.shape_indicator(
            case["shape"], case.get("cx", 0.1), case.get("cy", 0.0),
            case.get("size", 0.12), case.get("theta", 0.0),
            case.get("sx", 1.0), case.get("sy", 1.0))

        def mask(xs, ys):
            xx, yy = np.meshgrid(xs, ys, indexing="ij")
            return inside(xx, yy).astype(np.float64)

        su[i], sv[i], zone[i] = mask(xu, yc), mask(xc, yv), mask(xc, yc)
        u_in[i] = case.get("u_inlet", fvm.U_INLET)
        v_in[i] = case.get("v_inlet", 0.0)
        d = case.get("d", fvm.DARCY_D)
        d_x[i], d_y[i] = ((float(d[0]), float(d[1])) if np.ndim(d)
                          else (float(d),) * 2)
        f_c[i] = case.get("f", fvm.FORCH_F)

    speed = np.hypot(u_in, v_in)
    dt = 0.4 * np.minimum(dx / np.maximum(speed * 3.0, 1e-9),
                          dx * dx / (4.0 * nu))

    # Kronecker-sum eigenbasis of fvm._poisson_matrix: x has the Dirichlet
    # ghost at the outlet face (i = nx-1 diagonal -3/dx^2), y is pure Neumann.
    Qx, lx = _poisson_eig(nx, dx, dirichlet_end=True)
    Qy, ly = _poisson_eig(ny, dy, dirichlet_end=False)
    lam = (lx[:, None] + ly[None, :]).astype(dtype)
    Qx, Qy = Qx.astype(dtype), Qy.astype(dtype)

    su_j = jnp.asarray(su, dtype)
    sv_j = jnp.asarray(sv, dtype)
    uin_j = jnp.asarray(u_in, dtype)[:, None]          # (B, 1) for u[:, 0]
    vin_j = jnp.asarray(v_in, dtype)[:, None, None]    # (B, 1, 1) ghost rows
    spd_j = jnp.asarray(speed, dtype)
    dt_j = jnp.asarray(dt, dtype)[:, None, None]       # (B, 1, 1)
    dtb = jnp.asarray(dt, dtype)                       # (B,)
    dx_coef = jnp.asarray(nu * d_x, dtype)[:, None, None]
    dy_coef = jnp.asarray(nu * d_y, dtype)[:, None, None]
    f_j = jnp.asarray(f_c, dtype)[:, None, None]

    def ghost_u(u):
        """u with wall ghost rows (slip: du/dy = 0)."""
        return jnp.concatenate([u[:, :, :1], u, u[:, :, -1:]], axis=2)

    def convect_diffuse_u(u, v):
        """-(d(uu)/dx + d(uv)/dy) + nu lap(u) on interior u-faces."""
        ug = ghost_u(u)                                # (B, nx+1, ny+2)
        uc = 0.5 * (u[:, 1:, :] + u[:, :-1, :])        # (B, nx, ny)
        uu = uc * uc
        duu = (uu[:, 1:, :] - uu[:, :-1, :]) / dx
        uw = jnp.where(uc >= 0, u[:, :-1, :], u[:, 1:, :])
        uuw = uc * uw
        duu_up = (uuw[:, 1:, :] - uuw[:, :-1, :]) / dx
        duu = (1 - upwind) * duu + upwind * duu_up
        vf = 0.5 * (v[:, 1:, :] + v[:, :-1, :])        # (B, nx-1, ny+1)
        uf = 0.5 * (ug[:, 1:-1, 1:] + ug[:, 1:-1, :-1])
        uv = vf * uf
        duv = (uv[:, :, 1:] - uv[:, :, :-1]) / dy
        lap = ((u[:, 2:, :] - 2 * u[:, 1:-1, :] + u[:, :-2, :]) / dx ** 2
               + (ug[:, 1:-1, 2:] - 2 * ug[:, 1:-1, 1:-1]
                  + ug[:, 1:-1, :-2]) / dy ** 2)
        return -(duu + duv) + nu * lap

    def convect_diffuse_v(u, v):
        """Same for interior v-faces (inlet Dirichlet ghost carries the
        per-case v_inlet; outlet zero-gradient)."""
        vg = jnp.concatenate([2.0 * vin_j - v[:, :1, :], v, v[:, -1:, :]],
                             axis=1)                   # (B, nx+2, ny+1)
        vc = 0.5 * (v[:, :, 1:] + v[:, :, :-1])        # (B, nx, ny)
        vv = vc * vc
        dvv = (vv[:, :, 1:] - vv[:, :, :-1]) / dy
        vwid = jnp.where(vc >= 0, v[:, :, :-1], v[:, :, 1:])
        vcw = vc * vwid
        dvv_up = (vcw[:, :, 1:] - vcw[:, :, :-1]) / dy
        dvv = (1 - upwind) * dvv + upwind * dvv_up
        uf = 0.5 * (u[:, :, 1:] + u[:, :, :-1])        # (B, nx+1, ny-1)
        vf = 0.5 * (vg[:, 1:, 1:-1] + vg[:, :-1, 1:-1])
        uv = uf * vf
        duv = (uv[:, 1:, :] - uv[:, :-1, :]) / dx
        lap = ((vg[:, 2:, 1:-1] - 2 * vg[:, 1:-1, 1:-1]
                + vg[:, :-2, 1:-1]) / dx ** 2
               + (v[:, :, 2:] - 2 * v[:, :, 1:-1] + v[:, :, :-2]) / dy ** 2)
        return -(duv + dvv) + nu * lap

    def poisson(b):
        t = jnp.einsum("xi,bxy->biy", Qx, b)
        t = jnp.einsum("yj,biy->bij", Qy, t)
        t = t / lam
        t = jnp.einsum("yj,bij->biy", Qy, t)
        return jnp.einsum("xi,biy->bxy", Qx, t)

    def body(state):
        u, v, p, res, steps, done = state
        s_u = (dx_coef + 0.5 * f_j * jnp.abs(u[:, 1:-1, :])) * su_j[:, 1:-1, :]
        s_v = (dy_coef + 0.5 * f_j * jnp.abs(v[:, :, 1:-1])) * sv_j[:, :, 1:-1]

        rhs_u = convect_diffuse_u(u, v) - (p[:, 1:, :] - p[:, :-1, :]) / dx
        rhs_v = convect_diffuse_v(u, v) - (p[:, :, 1:] - p[:, :, :-1]) / dy

        u_star = u.at[:, 1:-1, :].set((u[:, 1:-1, :] + dt_j * rhs_u)
                                      / (1.0 + dt_j * s_u))
        v_star = v.at[:, :, 1:-1].set((v[:, :, 1:-1] + dt_j * rhs_v)
                                      / (1.0 + dt_j * s_v))
        u_star = u_star.at[:, 0, :].set(uin_j)
        u_star = u_star.at[:, -1, :].set(u_star[:, -2, :])
        v_star = v_star.at[:, :, 0].set(0.0)
        v_star = v_star.at[:, :, -1].set(0.0)

        div = ((u_star[:, 1:, :] - u_star[:, :-1, :]) / dx
               + (v_star[:, :, 1:] - v_star[:, :, :-1]) / dy)
        phi = poisson(div / dt_j)

        u_new = u_star.at[:, 1:-1, :].add(
            -dt_j * (phi[:, 1:, :] - phi[:, :-1, :]) / dx)
        u_new = u_new.at[:, -1, :].add(
            -dtb[:, None] * (0.0 - phi[:, -1, :]) * 2.0 / dx)
        v_new = v_star.at[:, :, 1:-1].add(
            -dt_j * (phi[:, :, 1:] - phi[:, :, :-1]) / dy)
        p_new = p + phi

        p_scale = jnp.maximum(0.5 * spd_j ** 2,
                              jnp.max(jnp.abs(p_new), axis=(1, 2)))
        res_new = jnp.maximum(
            jnp.max(jnp.abs(u_new - u), axis=(1, 2)) / (dtb * spd_j),
            jnp.max(jnp.abs(phi), axis=(1, 2)) / (dtb * p_scale))

        frz = done[:, None, None]
        u = jnp.where(frz, u, u_new)
        v = jnp.where(frz, v, v_new)
        p = jnp.where(frz, p, p_new)
        res = jnp.where(done, res, res_new)
        steps = steps + jnp.where(done, 0, 1)
        done = done | (res_new < tol)
        return u, v, p, res, steps, done

    def cond(state):
        *_, steps, done = state
        return (~jnp.all(done)) & (jnp.max(steps) < max_steps)

    u0 = jnp.broadcast_to(uin_j[:, :, None], (B, nx + 1, ny)).astype(dtype)
    state0 = (u0, jnp.zeros((B, nx, ny + 1), dtype),
              jnp.zeros((B, nx, ny), dtype),
              jnp.full((B,), jnp.inf, dtype),
              jnp.zeros((B,), jnp.int32),
              jnp.zeros((B,), bool))

    run = jax.jit(lambda s: jax.lax.while_loop(cond, body, s))
    u, v, p, res, steps, done = (np.asarray(a) for a in run(state0))

    sols = []
    for i in range(B):
        uc = 0.5 * (u[i, 1:, :] + u[i, :-1, :]).astype(np.float64)
        vc = 0.5 * (v[i][:, 1:] + v[i][:, :-1]).astype(np.float64)
        p64 = p[i].astype(np.float64)
        div_c = ((u[i, 1:, :] - u[i, :-1, :]) / dx
                 + (v[i][:, 1:] - v[i][:, :-1]) / dy).astype(np.float64)
        merr = fvm._momentum_residual(uc, vc, p64, zone[i], dx, dy, nu,
                                      (d_x[i], d_y[i]), f_c[i])
        sols.append(DuctSolution(xc, yc, uc, vc, p64, zone[i], div_c, merr,
                                 float(res[i]), int(steps[i])))
    return sols
