"""FVM reference solver: analytic validation + case-emission round trip.

The solver provides the CFD ground truth for the duct accuracy north star
(U, p rel-L2 < 5% vs CFD), so it is itself validated against an exact
solution here: a full-height porous band in a slip-wall duct forces
``u = (U_in, 0)`` everywhere by continuity, and the momentum balance reduces
to the 1D Darcy-Forchheimer pressure drop
``dp = L_band * (nu*d*U + 0.5*f*U^2)``.
"""
import numpy as np
import pytest

from porous_cfd_tpu.datagen import fvm


def test_band_case_matches_analytic_solution():
    nx, ny = 60, 24
    sol = fvm.solve_duct("band", cx=0.1, cy=0.0, size=0.1, nx=nx, ny=ny,
                         tol=1e-5, max_steps=4000)
    u_in = fvm.U_INLET

    # velocity: exactly uniform (continuity in quasi-1D), v = 0
    assert np.abs(sol.u - u_in).max() / u_in < 1e-8
    assert np.abs(sol.v).max() < 1e-10
    # continuity at machine level after projection
    assert np.abs(sol.div).max() < 1e-10

    # pressure drop: the discrete band width is the face-mask quadrature of
    # the indicator (converges O(dx) to the continuous 0.2)
    dx = 1.0 / nx
    xu = fvm.DOMAIN[0][0] + np.arange(nx + 1) * dx
    n_faces = int(np.sum(np.abs(xu - 0.1) <= 0.1))
    dp_expected = n_faces * dx * (fvm.NU * fvm.DARCY_D * u_in
                                  + 0.5 * fvm.FORCH_F * u_in ** 2)
    p_in = sol.p[0, :].mean()
    assert abs(p_in - dp_expected) / dp_expected < 5e-3
    # pressure constant outside the band, linear inside
    outside = np.abs(sol.x) - 1e-9 > 0.1 + dx  # clear of the smeared interface
    left = outside & (sol.x < 0.0)
    right = outside & (sol.x > 0.2)
    assert sol.p[left].std() < 1e-4 * dp_expected
    assert np.abs(sol.p[right]).max() < 1e-3 * dp_expected


def test_obstacle_case_is_physical():
    sol = fvm.solve_duct("circle", cx=0.1, cy=0.0, size=0.12, nx=48, ny=32,
                         tol=5e-4, max_steps=8000)
    assert sol.residual < 5e-4
    assert np.isfinite(sol.u).all() and np.isfinite(sol.p).all()
    # mass conservation: projection-level divergence + global flux balance
    assert np.abs(sol.div).max() < 1e-10
    flux_in = sol.u[0, :].mean()
    flux_out = sol.u[-1, :].mean()
    assert abs(flux_out - flux_in) / flux_in < 1e-10
    # flow deflects around the obstacle: transverse velocity appears and the
    # bypass accelerates beyond the inlet speed
    assert np.abs(sol.v).max() > 0.1 * fvm.U_INLET
    assert sol.u.max() > 1.2 * fvm.U_INLET
    # the porous core is slower than the free stream
    assert sol.u[sol.zone > 0].mean() < 0.8 * fvm.U_INLET
    # momentum residual: discretization-level away from the zone interface
    assert np.median(np.abs(sol.moment_err)) < 1e-2


def test_case_round_trip(tmp_path):
    """solution_to_case writes a case the parser + dataset stack consume."""
    from porous_cfd_tpu.data import parser
    from porous_cfd_tpu.data.dataset import FoamDataset

    sol = fvm.solve_duct("circle", cx=0.1, cy=0.0, size=0.12, nx=40, ny=24,
                         tol=1e-3, max_steps=4000)
    from porous_cfd_tpu.datagen.meta import generate_meta, generate_min_points
    from porous_cfd_tpu.datagen.synthetic_case import write_data_config

    split = tmp_path / "train"
    for i in range(2):
        fvm.solution_to_case(sol, split / f"case_{i}", n_internal=400,
                             rng=np.random.default_rng(i))
    write_data_config(split, ["C", "U", "p", "cellToRegion"], {},
                      {"Scale": [], "Standardize": ["C", "U", "p"]},
                      ["x", "y"])
    generate_meta(split, "C", "U", "p", "cellToRegion", max_dim=2)
    generate_min_points(tmp_path)

    internal, boundary = parser.parse_case_fields(
        str(split / "case_0"), "C", "U", "p", "cellToRegion", "d", "f",
        max_dim=2)
    assert internal["U"].shape == (400, 2)
    assert set(boundary) == {"inlet", "interface", "outlet", "walls"}
    # inlet BC values survive the round trip
    np.testing.assert_allclose(boundary["inlet"]["U"][:, 0], fvm.U_INLET)
    np.testing.assert_allclose(boundary["outlet"]["p"][:, 0], 0.0)
    # porosity coefficients: zone-masked d/f
    porous = internal["cellToRegion"][:, 0] > 0
    assert (internal["d"][porous] == fvm.DARCY_D).all()
    assert (internal["d"][~porous] == 0).all()

    ds = FoamDataset(str(split), 200, 60, 40, np.random.default_rng(8421))
    for i in range(2):
        assert np.isfinite(np.asarray(ds[i].data)).all()
    # solver wall-time lands in timing metadata
    assert parser.parse_elapsed_time(str(split / "case_0")) > 0
