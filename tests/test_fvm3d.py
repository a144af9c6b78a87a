"""3D FVM reference solver validation (datagen/fvm3d.py): analytic
Darcy-Forchheimer pressure drop on the quasi-1D porous band, divergence-free
projection, and case emission consumable by the standard dataset stack."""
import numpy as np
import pytest

from porous_cfd_tpu.datagen import fvm3d


@pytest.fixture(scope="module")
def band_solution():
    return fvm3d.solve_duct3("band", (0.1, 0.0, 0.0), 0.1,
                             nx=40, ny=12, nz=12, tol=1e-4)


def test_band_matches_analytic_pressure_drop(band_solution):
    """Full-cross-section porous band: u stays uniform at U_inlet and the
    pressure drop equals the integrated Darcy-Forchheimer sink
    (nu*d + f/2*U) * U * L (same verification as the 2D solver,
    tests/test_fvm.py)."""
    sol = band_solution
    u_in = fvm3d.U_INLET
    assert np.abs(sol.u - u_in).max() / u_in < 1e-10
    assert np.abs(sol.v).max() < 1e-12
    assert np.abs(sol.w).max() < 1e-12

    length = 2 * 0.1
    dp_analytic = (fvm3d.NU * fvm3d.DARCY_D
                   + 0.5 * fvm3d.FORCH_F * u_in) * u_in * length
    line = sol.p[:, 6, 6]
    dp = line[sol.x < 0.0][-1] - line[sol.x > 0.2][0]
    assert abs(dp - dp_analytic) / dp_analytic < 1e-6


def test_band_divergence_free(band_solution):
    assert np.abs(band_solution.div).max() < 1e-10


def test_sphere_converges_and_conserves():
    sol = fvm3d.solve_duct3("sphere", (0.1, 0.0, 0.0), 0.12,
                            nx=24, ny=14, nz=14, tol=5e-4, max_steps=4000)
    assert sol.residual < 5e-4
    assert np.abs(sol.div).max() < 1e-10
    # mass flux through each x-plane equals the inlet flux
    dy = 0.6 / 14
    dz = 0.6 / 14
    influx = fvm3d.U_INLET * 0.6 * 0.6
    flux = sol.u.sum(axis=(1, 2)) * dy * dz
    assert np.abs(flux - influx).max() / influx < 0.02
    # the porous obstacle slows the flow inside the zone
    assert sol.u[sol.zone > 0].mean() < 0.9 * fvm3d.U_INLET


def test_case_roundtrip(tmp_path):
    from porous_cfd_tpu.data import parser

    sol = fvm3d.solve_duct3("box", (0.1, 0.0, 0.0), 0.1,
                            nx=20, ny=10, nz=10, tol=1e-3, max_steps=2000)
    fvm3d.solution_to_case3(sol, tmp_path / "case_0", n_internal=500,
                            n_per_patch=40)
    internal, patches = parser.parse_case_fields(
        str(tmp_path / "case_0"), "C", "U", "p", "cellToRegion", max_dim=3)
    assert internal["C"].shape == (500, 3)
    assert internal["U"].shape == (500, 3)
    assert set(patches) == {"inlet", "interface", "outlet", "walls"}
    assert patches["inlet"]["U"].shape == (40, 3)
    np.testing.assert_allclose(patches["inlet"]["U"][:, 0], fvm3d.U_INLET)
    assert parser.parse_coef(str(tmp_path / "case_0"), "d")[0] == 14000.0
