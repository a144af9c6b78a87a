"""Generate the primitive 2D porous-shape mesh assets (reference ships 11
hand-made OBJ primitives, examples/duct_fixed_boundary/assets/meshes/standard).
Flat polygons in the z=0 plane, unit-ish scale, written as triangle fans."""
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from porous_cfd_tpu.datagen import mesh_ops  # noqa: E402


def polygon(n, radius=0.05, start=0.0):
    a = start + np.linspace(0, 2 * np.pi, n, endpoint=False)
    return np.stack([radius * np.cos(a), radius * np.sin(a),
                     np.zeros_like(a)], -1)


def fan_faces(n):
    return [(0, i, i + 1) for i in range(1, n - 1)]


def write(dest, name, verts):
    mesh_ops.write_obj(Path(dest) / name, verts, fan_faces(len(verts)))


def main(dest):
    dest = Path(dest)
    dest.mkdir(parents=True, exist_ok=True)
    write(dest, "circle.obj", polygon(64))
    write(dest, "ellipse.obj", polygon(64) * np.array([1.0, 0.6, 1.0]))
    write(dest, "square.obj", polygon(4, start=np.pi / 4))
    write(dest, "rectangle.obj",
          polygon(4, start=np.pi / 4) * np.array([1.4, 0.7, 1.0]))
    write(dest, "equilateral_triangle.obj", polygon(3, start=np.pi / 2))
    write(dest, "equilateral_hexagon.obj", polygon(6))
    write(dest, "equilateral_octagon.obj", polygon(8))
    write(dest, "semi_circle.obj", np.concatenate([
        polygon(33)[:17], [[0.0, 0.0, 0.0]]]))
    write(dest, "circle_sector.obj", np.concatenate([
        [[0.0, 0.0, 0.0]], polygon(65)[:17]]))
    write(dest, "right_triangle.obj",
          np.array([[0, 0, 0], [0.08, 0, 0], [0, 0.06, 0]], float))
    write(dest, "rhombus.obj",
          np.array([[0.05, 0, 0], [0, 0.03, 0], [-0.05, 0, 0],
                    [0, -0.03, 0]], float))
    print(f"wrote 11 primitives to {dest}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else
         "examples/duct_fixed_boundary/assets/meshes/standard")
