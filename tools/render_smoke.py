"""Headless render smoke job: actually execute the pyvista (and bpy) code
paths that are environment-gated in the test suite, wherever those packages
are installed (deploy/Dockerfile ships them; VERDICT r2 weak #4: the render
code was cold).

Exercises, off-screen, with screenshots under --out:
  * ``viz3d.plot_orthogonal_slices`` + ``viz3d.plot_3d_streamlines`` on a
    synthetic interpolated duct field (pyvista ImageData — no OpenFOAM mesh
    needed);
  * ``viz3d.plot_houses`` with a checked-in windbreaks house mesh;
  * a bpy import + boolean-union + voxel-remesh mini-workflow (the hard-duct
    generator's mesh ops) when Blender-as-module is available.

Exits 0 with a SKIP note per missing package (so CI can run it anywhere) and
non-zero if an installed surface fails.

Usage: python tools/render_smoke.py [--out /tmp/render_smoke]
"""
import argparse
import sys
import traceback
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

HOUSE = REPO / "examples/windbreaks/assets/meshes/standard/houses/house_0.obj"


def smoke_pyvista(out: Path) -> str:
    try:
        import pyvista as pv
    except Exception:
        return "SKIP (pyvista not installed)"

    from porous_cfd_tpu.viz import viz3d

    # synthetic duct field on a regular grid, named like _interpolated_mesh
    grid = pv.ImageData(dimensions=(40, 24, 24), spacing=(0.025, 0.025, 0.025),
                        origin=(-0.4, -0.3, -0.3))
    pts = np.asarray(grid.points)
    r2 = pts[:, 1] ** 2 + pts[:, 2] ** 2
    u = np.stack([0.2 * (1 - r2 / 0.18) * (1 - 0.5 * np.exp(
        -((pts[:, 0] - 0.1) ** 2) / 0.01)),
        0.02 * pts[:, 1], 0.02 * pts[:, 2]], axis=-1)
    grid["Uinterp"] = u
    grid["pinterp"] = 0.9 - pts[:, 0]

    plotter = pv.Plotter(shape=(2, 3), off_screen=True,
                         window_size=[1200, 800])
    inlet_pts = pts[np.abs(pts[:, 0] + 0.4) < 1e-6]
    plotter.subplot(0, 0)
    viz3d.plot_3d_streamlines(grid, inlet_pts, plotter)
    viz3d.plot_orthogonal_slices(grid, "Uinterp", "U", (0.1, 0.0, 0.0),
                                 plotter, (1, 0))
    plotter.show(screenshot=str(out / "slices_streamlines.png"))

    viz3d.plot_houses("house_errors", pts[::37, :],
                      u[::37] * 0.01, (0.9 - pts[::37, 0]) * 0.01,
                      HOUSE, save_path=str(out))
    return "OK (slices, streamlines, houses rendered)"


def smoke_bpy(out: Path) -> str:
    try:
        import bpy  # noqa: F401
    except Exception:
        return "SKIP (bpy not installed)"

    from examples.duct_fixed_boundary_hard.generator_2d_fixed import \
        Generator2DFixedHard  # noqa: F401  (import exercises the bpy surface)
    import bmesh
    import bpy as b

    b.ops.wm.read_factory_settings(use_empty=True)
    b.ops.mesh.primitive_cube_add(size=1.0, location=(0, 0, 0))
    cube = b.context.active_object
    b.ops.mesh.primitive_uv_sphere_add(radius=0.6, location=(0.4, 0, 0))
    sphere = b.context.active_object
    mod = cube.modifiers.new("union", "BOOLEAN")
    mod.operation = "UNION"
    mod.object = sphere
    b.context.view_layer.objects.active = cube
    b.ops.object.modifier_apply(modifier="union")
    remesh = cube.modifiers.new("remesh", "REMESH")
    remesh.mode = "VOXEL"
    remesh.voxel_size = 0.1
    b.ops.object.modifier_apply(modifier="remesh")
    bm = bmesh.new()
    bm.from_mesh(cube.data)
    n_verts = len(bm.verts)
    bm.free()
    return f"OK (boolean + voxel remesh -> {n_verts} verts)"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/render_smoke")
    args = ap.parse_args()
    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)

    failed = False
    for name, fn in [("pyvista", smoke_pyvista), ("bpy", smoke_bpy)]:
        try:
            print(f"{name}: {fn(out)}", flush=True)
        except Exception:
            failed = True
            print(f"{name}: FAILED", flush=True)
            traceback.print_exc()
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
