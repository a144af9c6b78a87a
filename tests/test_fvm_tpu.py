"""The TPU-batched 2D solver (datagen/fvm_tpu.py) reproduces the numpy
reference solver's steady fields: same discretization (staggered MAC +
incremental projection, Kronecker-sum eigenbasis Poisson vs prefactorized
sparse), f32 batched march vs f64 sequential march, on a small grid so the
test runs in CPU time. Covers the variable-boundary protocol's batch axes:
anisotropic Darcy d, per-case f, angled inlet."""
import numpy as np

from porous_cfd_tpu.datagen import fvm
from porous_cfd_tpu.datagen.fvm_tpu import solve_duct_batch

GRID = dict(nx=40, ny=24)
TOL, MAX_STEPS = 5e-4, 8000
CASES = [
    dict(shape="circle", cx=0.10, cy=0.00, size=0.12, theta=0.0),
    dict(shape="square", cx=0.08, cy=0.02, size=0.12, theta=np.radians(30),
         sx=0.875, sy=0.75),
    dict(shape="ellipse", cx=0.12, cy=-0.02, size=0.13, theta=np.radians(70),
         d=(12000.0, 20000.0), f=30.80,
         u_inlet=0.15 * np.cos(np.radians(20)),
         v_inlet=0.15 * np.sin(np.radians(20))),
]


def rel(a, b):
    return np.linalg.norm(a - b) / (np.linalg.norm(b) + 1e-12)


def test_batched_matches_numpy_reference():
    sols = solve_duct_batch(CASES, tol=TOL, max_steps=MAX_STEPS, **GRID)
    for case, sol in zip(CASES, sols):
        ref = fvm.solve_duct(**case, tol=TOL, max_steps=MAX_STEPS, **GRID)
        assert sol.residual < TOL, (case["shape"], sol.residual)
        assert ref.residual < TOL, (case["shape"], ref.residual)
        # converged steady states agree to f32-march accuracy; the transverse
        # component is normalized by the full velocity scale (symmetric cases
        # have v ~ 0 in both solvers)
        uscale = np.linalg.norm(np.stack([ref.u, ref.v]))
        assert rel(sol.u, ref.u) < 2e-3, (case["shape"], rel(sol.u, ref.u))
        assert np.linalg.norm(sol.v - ref.v) / uscale < 2e-3
        assert rel(sol.p, ref.p) < 2e-3, (case["shape"], rel(sol.p, ref.p))
        np.testing.assert_array_equal(sol.zone, ref.zone)
        # physics self-check: momentum residual from the batched fields is
        # as small as the reference's
        m_s = np.abs(sol.moment_err[1:-1, 1:-1]).mean()
        m_r = np.abs(ref.moment_err[1:-1, 1:-1]).mean()
        assert m_s < m_r * 1.5 + 1e-8
