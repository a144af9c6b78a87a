"""The TPU-batched 3D solver (datagen/fvm3d_tpu.py) reproduces the numpy
reference solver's steady fields: same discretization, f32 batched march vs
f64 sequential march, on a small grid so the test runs in CPU time."""
import numpy as np

from porous_cfd_tpu.datagen import fvm3d
from porous_cfd_tpu.datagen.fvm3d_tpu import solve_duct3_batch

GRID = dict(nx=20, ny=12, nz=12)
TOL, MAX_STEPS = 5e-4, 6000
CASES = [("band", (0.1, 0.0, 0.0), 0.10, 0.20),
         ("sphere", (0.12, 0.02, -0.02), 0.12, 0.16)]


def rel(a, b):
    return np.linalg.norm(a - b) / (np.linalg.norm(b) + 1e-12)


def test_batched_matches_numpy_reference():
    sols = solve_duct3_batch(CASES, tol=TOL, max_steps=MAX_STEPS, **GRID)
    for (shape, center, size, u_in), sol in zip(CASES, sols):
        ref = fvm3d.solve_duct3(shape, center, size, u_inlet=u_in,
                                tol=TOL, max_steps=MAX_STEPS, **GRID)
        assert sol.residual < TOL, (shape, sol.residual)
        assert ref.residual < TOL, (shape, ref.residual)
        # converged steady states agree to f32-march accuracy; the
        # transverse components are normalized by the FULL velocity scale
        # (quasi-1D cases have v = w = 0 in both solvers)
        uscale = np.linalg.norm(np.stack([ref.u, ref.v, ref.w]))
        assert rel(sol.u, ref.u) < 2e-3, (shape, rel(sol.u, ref.u))
        assert np.linalg.norm(sol.v - ref.v) / uscale < 2e-3
        assert np.linalg.norm(sol.w - ref.w) / uscale < 2e-3
        assert rel(sol.p, ref.p) < 2e-3, (shape, rel(sol.p, ref.p))
        np.testing.assert_array_equal(sol.zone, ref.zone)
        # the physics self-check: momentum residual computed from the
        # batched fields is as small as the reference's
        m_s = np.abs(sol.moment_err[1:-1, 1:-1, 1:-1]).mean()
        m_r = np.abs(ref.moment_err[1:-1, 1:-1, 1:-1]).mean()
        assert m_s < m_r * 1.5 + 1e-8
