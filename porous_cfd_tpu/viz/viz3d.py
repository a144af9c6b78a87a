"""3D field visualization. The reference renders with PyVista
(``visualization/visualization_3d.py``); PyVista is optional here — when it is
installed the same plot set is produced (scatter fields, orthogonal slices,
inlet-seeded streamlines, surface error plots); otherwise a matplotlib-3D
scatter fallback covers the scatter/field plots so 3D experiments remain
inspectable in minimal environments.
"""
from __future__ import annotations

from pathlib import Path

import numpy as np
from matplotlib import pyplot as plt

from porous_cfd_tpu.viz.common import M2_S2, M_S, plot_or_save

try:  # optional dependency
    import pyvista  # noqa: F401
    HAS_PYVISTA = True
except Exception:  # pragma: no cover
    HAS_PYVISTA = False


def _scatter3d(ax, points, values, title, cmap="coolwarm"):
    sc = ax.scatter(points[:, 0], points[:, 1], points[:, 2],
                    c=np.asarray(values).flatten(), cmap=cmap, s=4)
    ax.set_title(title)
    return sc


def plot_scatter_field(title, points, values, save_path=None):
    """Single 3D scatter field (visualization_3d.py:16-34)."""
    if HAS_PYVISTA:
        return _pv_scatter(title, points, values, save_path)
    fig = plt.figure(figsize=(10, 8))
    fig.suptitle(title)
    ax = fig.add_subplot(projection="3d")
    sc = _scatter3d(ax, np.asarray(points), values, title)
    fig.colorbar(sc, shrink=0.6)
    plot_or_save(fig, save_path)


def plot_fields_3d(title, points, u, p, save_path=None):
    """4-panel 3D scatter (Ux, Uy, Uz magnitude handled per panel;
    visualization_3d.py:212-237)."""
    points, u, p = np.asarray(points), np.asarray(u), np.asarray(p)
    fig = plt.figure(figsize=(16, 12))
    fig.suptitle(title, fontsize=20)
    panels = [(f"$u_x {M_S}$", u[:, 0]), (f"$u_y {M_S}$", u[:, 1]),
              (f"$p {M2_S2}$", p), (f"$U {M_S}$", np.linalg.norm(u, axis=1))]
    for i, (name, vals) in enumerate(panels):
        ax = fig.add_subplot(2, 2, i + 1, projection="3d")
        sc = _scatter3d(ax, points, vals, name)
        fig.colorbar(sc, shrink=0.5)
    plot_or_save(fig, save_path)


def plot_slices(title, points, values, axis=2, n_slices=3, save_path=None):
    """Orthogonal slice scatter plots (visualization_3d.py:37-84 capability)."""
    points, values = np.asarray(points), np.asarray(values).flatten()
    coords = points[:, axis]
    edges = np.quantile(coords, np.linspace(0, 1, n_slices + 1))
    other = [i for i in range(3) if i != axis]
    fig, axs = plt.subplots(1, n_slices, figsize=(5 * n_slices, 5))
    fig.suptitle(title)
    for i, ax in enumerate(np.atleast_1d(axs)):
        sel = (coords >= edges[i]) & (coords <= edges[i + 1])
        sc = ax.scatter(points[sel, other[0]], points[sel, other[1]],
                        c=values[sel], cmap="coolwarm", s=6)
        ax.set_title(f"slice {i}")
        ax.set_aspect("equal")
        fig.colorbar(sc, ax=ax)
    plot_or_save(fig, save_path)


def plot_surface_errors(title, surface_points, errors, save_path=None):
    """Per-surface-point error scatter (house-surface plots,
    visualization_3d.py:178-209)."""
    plot_scatter_field(title, surface_points, errors, save_path)


# -- pyvista-backed implementations -------------------------------------------

def _pv_scatter(title, points, values, save_path):  # pragma: no cover
    import pyvista as pv
    cloud = pv.PolyData(np.asarray(points, np.float64))
    cloud[title] = np.asarray(values).flatten()
    plotter = pv.Plotter(off_screen=save_path is not None)
    plotter.add_mesh(cloud, scalars=title, cmap="coolwarm",
                     render_points_as_spheres=True, point_size=8)
    plotter.add_title(title)
    if save_path is not None:
        plotter.screenshot(f"{save_path}/{title}.png")
    else:
        plotter.show()


def plot_streamlines(title, case_path, points, u, save_path=None):
    """Inlet-seeded streamlines over the OpenFOAM mesh
    (visualization_3d.py:122-175). Requires PyVista + an OpenFOAM case."""
    if not HAS_PYVISTA:  # pragma: no cover
        raise RuntimeError(
            "plot_streamlines requires pyvista; install it or use "
            "plot_fields_3d for the scatter fallback")
    import pyvista as pv
    stub = Path(case_path) / "case.foam"
    stub.touch()
    reader = pv.OpenFOAMReader(str(stub))
    mesh = reader.read()["internalMesh"]
    cloud = pv.PolyData(np.asarray(points, np.float64))
    cloud["U"] = np.asarray(u)
    interp = mesh.interpolate(cloud)
    seeds = pv.PointSet(np.asarray(points)[:100])
    stream = interp.streamlines_from_source(seeds, vectors="U")
    plotter = pv.Plotter(off_screen=save_path is not None)
    plotter.add_mesh(stream.tube(radius=0.005))
    plotter.add_title(title)
    if save_path is not None:
        plotter.screenshot(f"{save_path}/{title}.png")
    else:
        plotter.show()
