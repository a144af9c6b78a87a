"""Visualization smoke tests: every plot function renders and saves a PNG
(Agg backend) without errors on representative data."""
import matplotlib

matplotlib.use("Agg")

import numpy as np
import pytest

from porous_cfd_tpu.viz import common as vc
from porous_cfd_tpu.viz import viz2d, viz3d

RNG = np.random.default_rng(0)
N = 120


@pytest.fixture
def pts2d():
    return RNG.uniform(0, 1, size=(N, 2))


def saved(tmp_path, name):
    return (tmp_path / f"{name}.png").exists()


def test_plot_data_dist(tmp_path):
    vc.plot_data_dist("dist", RNG.normal(size=(N, 2)), RNG.normal(size=(N, 1)),
                      (RNG.uniform(size=(N, 1)) > 0.5).astype(float), tmp_path)
    assert saved(tmp_path, "dist")


def test_plot_timing(tmp_path):
    vc.plot_timing([1.0, 100.0], [0.1, 10.0], tmp_path)
    assert saved(tmp_path, "Total simulation time [s]")


def test_plot_errors(tmp_path):
    vc.plot_errors("errs2d", [0.1, 0.2, 0.3], save_path=tmp_path)
    vc.plot_errors("errs3d", [0.1, 0.2, 0.3, 0.4], save_path=tmp_path)
    assert saved(tmp_path, "errs2d") and saved(tmp_path, "errs3d")


def test_plot_multi_bar(tmp_path):
    vc.plot_multi_bar("cmp", {"A": [1, 2], "B": [2, 1]}, ["$U$", "$p$"],
                      tmp_path)
    assert saved(tmp_path, "cmp")


def test_box_plot(tmp_path):
    vc.box_plot("box", [RNG.normal(size=N), RNG.normal(size=N)],
                ["$U_x$", "$p$"], tmp_path)
    assert saved(tmp_path, "box")


def test_plot_errors_vs_var(tmp_path):
    errors = np.abs(RNG.normal(size=(20, 3)))
    var = np.linspace(0, 1, 20)
    vc.plot_errors_vs_var("vs var", errors, var, ["Angle", "MAE"], tmp_path)
    assert saved(tmp_path, "vs var")


def test_heatmap(tmp_path):
    d = np.repeat([5000, 7000, 9000, 12000], 5)
    u = np.tile([0.1, 0.125, 0.15, 0.175, 0.2], 4)
    errors = np.abs(RNG.normal(size=(20, 3)))
    vc.plot_errors_vs_multi_vars("heat", errors, d, u, ["D", "U"], tmp_path)
    assert saved(tmp_path, "heat")
    hm, xs, ys = vc.get_heatmap(errors[:, 0], d, u)
    assert hm.shape == (5, 4)


def test_plot_per_case(tmp_path):
    vc.plot_per_case("per case", RNG.normal(size=(7, 3)), tmp_path)
    assert saved(tmp_path, "per case")


def test_viz2d_fields(tmp_path, pts2d):
    u = RNG.normal(size=(N, 2))
    p = RNG.normal(size=(N, 1))
    zone = (pts2d[:, 0] > 0.5).astype(float)
    viz2d.plot_fields("fields", pts2d, u, p, zone, save_path=tmp_path)
    assert saved(tmp_path, "fields")
    viz2d.plot_fields("errors", pts2d, np.abs(u), np.abs(p), zone,
                      plot_streams=False, save_path=tmp_path)
    assert saved(tmp_path, "errors")


def test_viz2d_mask(tmp_path, pts2d):
    u = RNG.normal(size=(N, 2))
    p = RNG.normal(size=(N, 1))
    zone = np.zeros(N)
    mask = [[(0.4, 0.4), (0.6, 0.6)]]
    viz2d.plot_fields("masked", pts2d, u, p, zone, save_path=tmp_path,
                      mask=mask)
    assert saved(tmp_path, "masked")


def test_viz3d_scatter(tmp_path):
    pts = RNG.uniform(size=(N, 3))
    u = RNG.normal(size=(N, 3))
    p = RNG.normal(size=(N, 1))
    viz3d.plot_fields_3d("f3d", pts, u, p, save_path=tmp_path)
    assert saved(tmp_path, "f3d")
    viz3d.plot_slices("slices", pts, p, save_path=tmp_path)
    assert saved(tmp_path, "slices")
    viz3d.plot_surface_errors("surf", pts[:30], np.abs(p[:30]),
                              save_path=tmp_path)
    assert saved(tmp_path, "surf")


def test_viz2d_plot_case(tmp_path):
    from porous_cfd_tpu.datagen import synthetic_case
    rng = np.random.default_rng(5)
    pts = rng.uniform(size=(80, 2))
    synthetic_case.write_case(
        tmp_path / "case", pts, (pts[:, 0] > 0.5).astype(float),
        {"walls": rng.uniform(size=(20, 2))},
        fields={"U": rng.normal(size=(80, 2)), "p": rng.normal(size=80)},
        patch_fields={"walls": {"U": rng.normal(size=(20, 2)),
                                "p": rng.normal(size=20)}})
    viz2d.plot_case(str(tmp_path / "case"), tmp_path)
    assert saved(tmp_path, "case")


def test_viz3d_streamline_geometry_helpers():
    """Inlet seeding + slice origin + camera placement — the physics-relevant
    geometry of the PyVista streamline figure, PyVista-free."""
    rng = np.random.default_rng(0)
    inlet = rng.uniform(size=(200, 3))
    inlet[::4, 0] = 0.0  # upstream face at x=0
    seeds = viz3d.inlet_seed_points(inlet, k=50, rng=rng)
    assert seeds.shape == (50, 3)
    assert np.all(seeds[:, 0] == 0.0)
    # every seed is one of the upstream-face points
    upstream = inlet[inlet[:, 0] == 0.0]
    assert all(any(np.allclose(s, q) for q in upstream) for s in seeds)

    class FakeSolid:
        center = (0.0, 0.0, 2.5)

    assert viz3d.slice_origin([(FakeSolid(), "oldlace")]) == (0.0, 0.0, 2.5)
    assert viz3d.slice_origin([]) == (0.0, 0.0, 1.0)

    cam = viz3d.camera_position(np.array([[2.0, 0.0, 0.0]]))
    np.testing.assert_allclose(cam, np.array([-0.8, -1.0, 0.5]) * 5.0)


def test_viz3d_pyvista_paths_gated():
    """Without pyvista the mesh-render entry points raise actionable errors
    instead of failing deep inside."""
    if viz3d.HAS_PYVISTA:
        import pytest
        pytest.skip("pyvista installed; gating not reachable")
    import pytest
    with pytest.raises(RuntimeError, match="pyvista"):
        viz3d.plot_streamlines("t", ".", np.zeros((4, 3)), np.zeros((4, 3)))
    with pytest.raises(RuntimeError, match="pyvista"):
        viz3d.plot_houses("t", np.zeros((4, 3)), np.zeros((4, 3)),
                          np.zeros((4, 1)), "house.obj")
