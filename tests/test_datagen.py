"""Datagen tests: momentum-error physics roundtrip, generator utilities
(proc splits, coef writing, splits mover, transforms parsing, mesh ops)."""
import json
from pathlib import Path
from random import Random

import numpy as np
import pytest

from porous_cfd_tpu.data import foam_io, parser
from porous_cfd_tpu.datagen import mesh_ops, synthetic_case
from porous_cfd_tpu.datagen.generator import DataGeneratorBase, Generator2DBase
from porous_cfd_tpu.datagen.momentum_error import (JAC_LABELS, LAP_LABELS,
                                                   write_momentum_error)

NU, D, F = 0.01, 50.0, 1.0


def analytic(points):
    """Manufactured solution + all derivative fields, padded to 3D."""
    x, y = points[:, 0], points[:, 1]
    z = np.zeros_like(x)
    u = np.stack([np.sin(y) * np.cos(x), -np.sin(x) * np.cos(y), z], -1)
    grad_p = np.stack([0.5 * np.sin(2 * x), 0.5 * np.sin(2 * y), z], -1)
    jac = {}
    jac["xx"] = -np.sin(y) * np.sin(x)
    jac["xy"] = np.cos(y) * np.cos(x)
    jac["yx"] = -np.cos(x) * np.cos(y)
    jac["yy"] = np.sin(x) * np.sin(y)
    for k in ["xz", "yz", "zx", "zy", "zz"]:
        jac[k] = z
    return u, grad_p, jac


def exact_lap_vectors(points):
    """grad(grad(U)ij) = gradient vectors of each Jacobian component."""
    x, y = points[:, 0], points[:, 1]
    z = np.zeros_like(x)
    out = {}
    # grad(U)xx = -siny sinx : grad = (-siny cosx, -cosy sinx, 0)
    out["xx"] = np.stack([-np.sin(y) * np.cos(x), -np.cos(y) * np.sin(x), z], -1)
    # grad(U)xy = cosy cosx : grad = (-cosy sinx, -siny cosx, 0)
    out["xy"] = np.stack([-np.cos(y) * np.sin(x), -np.sin(y) * np.cos(x), z], -1)
    # grad(U)yx = -cosx cosy : grad = (sinx cosy, cosx siny, 0)
    out["yx"] = np.stack([np.sin(x) * np.cos(y), np.cos(x) * np.sin(y), z], -1)
    # grad(U)yy = sinx siny : grad = (cosx siny, sinx cosy, 0)
    out["yy"] = np.stack([np.cos(x) * np.sin(y), np.sin(x) * np.cos(y), z], -1)
    for k in ["xz", "yz", "zx", "zy", "zz"]:
        out[k] = np.stack([z, z, z], -1)
    return out


def write_gradient_case(case_dir, rng, n_internal=40, n_patch=10):
    pts_i = rng.uniform(0.5, 5.0, size=(n_internal, 2))
    zone = (pts_i[:, 0] > 2.5).astype(np.float64)
    pts_b = rng.uniform(0.5, 5.0, size=(n_patch, 2))

    def fields_for(pts):
        u, grad_p, jac = analytic(pts)
        lap = exact_lap_vectors(pts)
        x, y = pts[:, 0], pts[:, 1]
        p = -0.25 * (np.cos(2 * x) + np.cos(2 * y))
        out = {"U": u, "p": p, "grad(p)": grad_p}
        for i in "xyz":
            for j in "xyz":
                out[f"grad(U){i}{j}"] = jac[f"{i}{j}"]
                out[f"grad(grad(U){i}{j})"] = lap[f"{i}{j}"]
        return out

    synthetic_case.write_case(
        case_dir, pts_i, zone, {"walls": pts_b},
        fields=fields_for(pts_i),
        patch_fields={"walls": fields_for(pts_b)},
        d=D, f=F, nu=NU)
    return pts_i, zone, pts_b


def test_momentum_error_matches_analytic_forcing(tmp_path):
    """momentError == the exact manufactured forcing (conv + grad p cancel for
    Taylor-Green; residual = 2 nu u + Darcy-Forchheimer source)."""
    rng = np.random.default_rng(0)
    case = tmp_path / "case"
    pts_i, zone, pts_b = write_gradient_case(case, rng)
    write_momentum_error(str(case))

    err = foam_io.read_field_file(case / "1000" / "momentError")["internal"]
    u, _, _ = analytic(pts_i)
    u_mag = np.linalg.norm(u, axis=-1, keepdims=True)
    expect = 2 * NU * u + u * (D * NU + 0.5 * u_mag * F) * zone[:, None]
    np.testing.assert_allclose(err, expect, atol=1e-6)

    # boundary dump exists and has zone = 0 (no source)
    pp = case / "postProcessing/walls/surface/1000/patch_walls/vectorField/momentError"
    bnd = foam_io.read_postprocess_field(pp)
    u_b, _, _ = analytic(pts_b)
    np.testing.assert_allclose(bnd, 2 * NU * u_b, atol=1e-6)


def test_momentum_error_readable_as_extra_field(tmp_path):
    rng = np.random.default_rng(1)
    case = tmp_path / "case"
    write_gradient_case(case, rng)
    write_momentum_error(str(case))
    internal = parser.parse_internal_fields(str(case), "momentError", max_dim=2)
    assert internal["momentError"].shape[1] == 2
    bnd = parser.parse_boundary_fields(str(case), "momentError", max_dim=2)
    assert bnd["walls"]["momentError"].shape[1] == 2


class _StubGen(Generator2DBase):
    def generate_openfoam_cases(self, *a, **k):
        pass

    def generate_data(self, *a, **k):
        pass


@pytest.fixture
def gen(tmp_path):
    src = tmp_path / "assets"
    (src / "meshes" / "standard").mkdir(parents=True)
    (src / "openfoam-case-template").mkdir()
    with open(src / "data_config.json", "w") as f:
        json.dump({"Fields": ["C"], "Dims": ["x", "y"],
                   "Variable boundaries": {},
                   "Normalize fields": None}, f)
    return _StubGen(str(src), "openfoam", 8)


def test_proc_split(gen):
    assert gen.compute_proc_split() == (4, 2)
    gen.n_procs = 4
    assert gen.compute_proc_split() == (2, 2)
    gen.n_procs = 2
    assert gen.compute_proc_split() == (2, 1)


def test_decompose_par_dict_edit(gen, tmp_path):
    d = tmp_path / "decomposeParDict"
    d.write_text("numberOfSubdomains 2;\n\ncoeffs\n{\n    n (2 1 1);\n}\n")
    gen.set_par_dict_coeffs(str(d))
    text = d.read_text()
    assert "numberOfSubdomains 8;" in text
    assert "n (4 2 1)" in text


def test_write_coefs_and_run_substitution(gen, tmp_path):
    fv = tmp_path / "fvOptions"
    fv.write_text("d   (14000 14000 14000);\nf   (17.11 17.11 17.11);\n")
    gen.write_coefs(str(fv), [1.0, 2.0, 3.0], "d")
    assert "d (1.0 2.0 3.0);" in fv.read_text()
    run = tmp_path / "Run"
    run.write_text("mpirun -np $n_proc solver -parallel\n")
    gen.set_run_n_proc(str(run))
    assert "mpirun -np 8 solver" in run.read_text()


def test_generate_split(gen, tmp_path):
    base = tmp_path / "data" / "standard"
    base.mkdir(parents=True)
    for i in range(10):
        (base / f"case_{i}").mkdir()
    cfg_dir = tmp_path / "cfg"
    cfg_dir.mkdir()
    with open(cfg_dir / "config.json", "w") as f:
        json.dump({"splits": {"train": 0.6, "val": 0.2, "test": 0.2}}, f)
    gen.generate_split(base, cfg_dir, Random(0))
    sizes = {s: len(list((tmp_path / "data" / s).iterdir()))
             for s in ["train", "val", "test"]}
    assert sizes["test"] == 2 and sizes["train"] == 6 and sizes["val"] == 2
    assert not base.exists()


def test_transforms_parsing(gen):
    assert gen.parse_rotations([]) == [0]
    assert gen.parse_rotations([0, 90, 3]) == [0, 45, 90]
    assert gen.parse_scale({"x": [], "y": []}) == [(1, 1)]
    assert gen.parse_scale({"xy": [1, 2, 2]}) == [(1.0, 1.0), (2.0, 2.0)]
    assert len(gen.parse_scale({"x": [1, 2, 2], "y": [1, 3, 3]})) == 6
    assert gen.parse_position_jitter({}) == [[0, 0], [0, 0]]
    assert gen.parse_position_jitter({"xy": [-1, 1]}) == [[-1, 1], [-1, 1]]
    assert gen.parse_angles({}) == [0]
    assert len(gen.parse_angles({"angle": [-30, 30, 2]})) == 3


def test_mesh_transform_pipeline(gen, tmp_path):
    meshes = tmp_path / "meshes"
    meshes.mkdir()
    square = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], float)
    mesh_ops.write_obj(meshes / "square.obj", square, [(0, 1, 2, 3)])
    with open(meshes / "transforms.json", "w") as f:
        json.dump({"square.obj": {"rotation": [0, 90, 2],
                                  "scale": {"xy": [1, 2, 2]}}}, f)
    out = tmp_path / "out"
    out.mkdir()
    gen.generate_transformed_meshes(meshes, out, Random(0))
    generated = sorted(p.name for p in out.glob("*.obj"))
    assert len(generated) == 4  # 2 scales x 2 rotations
    v, faces = mesh_ops.read_obj(out / generated[0])
    assert v.shape == (4, 3) and faces == [(0, 1, 2, 3)]


def test_obj_roundtrip_and_com(tmp_path):
    verts = np.array([[0, 0, 0], [2, 0, 0], [0, 2, 0]], float)
    mesh_ops.write_obj(tmp_path / "t.obj", verts, [(0, 1, 2)])
    v, f = mesh_ops.read_obj(tmp_path / "t.obj")
    np.testing.assert_allclose(v, verts)
    np.testing.assert_allclose(mesh_ops.center_of_mass(tmp_path / "t.obj"),
                               [2 / 3, 2 / 3, 0])


def test_grid_inside_point_cube(tmp_path):
    """The deepest interior point of a closed cube is near its center."""
    v = np.array([[x, y, z] for x in (0, 1) for y in (0, 1) for z in (0, 1)],
                 float)
    faces = [(0, 1, 3, 2), (4, 6, 7, 5), (0, 4, 5, 1), (2, 3, 7, 6),
             (0, 2, 6, 4), (1, 5, 7, 3)]
    tris = []
    for f in faces:  # triangulate with outward winding unchecked; use both
        tris.append((f[0], f[1], f[2]))
        tris.append((f[0], f[2], f[3]))
    mesh_ops.write_obj(tmp_path / "cube.obj", v, tris)
    center = mesh_ops.grid_inside_point(tmp_path / "cube.obj", resolution=8)
    assert np.all(center > 0.2) and np.all(center < 0.8)


def test_is_sane(gen, tmp_path):
    case = tmp_path / "case"
    (case / "constant" / "polyMesh").mkdir(parents=True)
    (case / "0").mkdir()
    (case / "constant" / "polyMesh" / "cellZones").write_text(
        "mesh\n{\ntype cellZone;\ncellLabels List<label>\n30\n(\n1\n)\n}\n")
    (case / "0" / "cellToRegion").write_text(
        "internalField nonuniform List<scalar>\n100\n(\n0\n)\n")
    assert gen.is_sane(str(case))
    (case / "constant" / "polyMesh" / "cellZones").write_text(
        "mesh\n{\ntype cellZone;\ncellLabels List<label>\n80\n(\n1\n)\n}\n")
    assert not gen.is_sane(str(case))
