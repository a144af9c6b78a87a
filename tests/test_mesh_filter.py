"""ABC mesh-filtering geometry (datagen/mesh_filter.py): island detection,
tet-sum volume, and the aspect/volume acceptance test — the numpy core behind
examples/abc/data_preprocess.py, exercised without Blender."""
import numpy as np
import pytest

from porous_cfd_tpu.datagen import mesh_filter

# unit cube: 8 verts, 12 triangles, outward orientation
CUBE_VERTS = np.array([[x, y, z] for x in (0, 1) for y in (0, 1)
                       for z in (0, 1)], dtype=float)
CUBE_TRIS = np.array([
    [0, 1, 3], [0, 3, 2],       # x=0 (inward normal -> signed parts cancel
    [4, 6, 7], [4, 7, 5],       # x=1  against the origin anchor; total = V)
    [0, 4, 5], [0, 5, 1],       # y=0
    [2, 3, 7], [2, 7, 6],       # y=1
    [0, 2, 6], [0, 6, 4],       # z=0
    [1, 5, 7], [1, 7, 3],       # z=1
])


def cube_edges():
    e = set()
    for t in CUBE_TRIS:
        for a, b in ((t[0], t[1]), (t[1], t[2]), (t[2], t[0])):
            e.add((min(a, b), max(a, b)))
    return np.array(sorted(e))


def test_cube_volume():
    assert mesh_filter.mesh_volume(CUBE_VERTS, CUBE_TRIS) == pytest.approx(1.0)
    # translation invariance (volume is origin-anchored but closed surfaces
    # telescope)
    shifted = CUBE_VERTS + np.array([5.0, -3.0, 2.0])
    assert mesh_filter.mesh_volume(shifted, CUBE_TRIS) == pytest.approx(1.0)
    # orientation flip -> negative signed volume
    flipped = CUBE_TRIS[:, ::-1]
    assert mesh_filter.mesh_volume(CUBE_VERTS, flipped) == pytest.approx(-1.0)


def test_volume_empty_and_scaling():
    assert mesh_filter.mesh_volume(CUBE_VERTS, np.zeros((0, 3), int)) == 0.0
    assert mesh_filter.mesh_volume(2 * CUBE_VERTS, CUBE_TRIS) == \
        pytest.approx(8.0)


def test_triangulate_fan():
    quad = [[0, 1, 2, 3]]
    tris = mesh_filter.triangulate_fan(quad)
    np.testing.assert_array_equal(tris, [[0, 1, 2], [0, 2, 3]])
    assert mesh_filter.triangulate_fan([]).shape == (0, 3)


def test_islands_single_component():
    assert not mesh_filter.has_multiple_islands(8, cube_edges())
    labels = mesh_filter.connected_components(8, cube_edges())
    assert labels.max() == 0


def test_islands_two_components_and_isolated_vertex():
    # two disjoint triangles
    edges = np.array([[0, 1], [1, 2], [2, 0], [3, 4], [4, 5], [5, 3]])
    assert mesh_filter.has_multiple_islands(6, edges)
    labels = mesh_filter.connected_components(6, edges)
    assert labels.max() == 1
    assert len(set(labels[:3])) == 1 and len(set(labels[3:])) == 1
    # isolated vertex counts as its own island (reference unseen-set walk)
    assert mesh_filter.has_multiple_islands(4, np.array([[0, 1], [1, 2]]))
    assert not mesh_filter.has_multiple_islands(1, np.zeros((0, 2), int))


def test_is_mesh_good_thresholds():
    # cube: aspect 1.0, volume ratio 1.0 -> accepted at defaults
    assert mesh_filter.is_mesh_good(CUBE_VERTS, CUBE_TRIS, 0.2, 0.2)
    # needle: aspect below the floor
    needle = CUBE_VERTS * np.array([10.0, 0.5, 0.5])
    assert not mesh_filter.is_mesh_good(needle, CUBE_TRIS, 0.2, 0.2)
    # thin shell: open quad sheet -> ~zero volume ratio
    sheet_v = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0],
                        [0, 0, 0.9]])  # 5th vert gives the bbox depth
    sheet_t = np.array([[0, 1, 2], [0, 2, 3]])
    assert not mesh_filter.is_mesh_good(sheet_v, sheet_t, 0.2, 0.2)
    # degenerate bbox (flat) -> rejected outright
    flat = CUBE_VERTS * np.array([1.0, 1.0, 0.0])
    assert not mesh_filter.is_mesh_good(flat, CUBE_TRIS, 0.2, 0.2)


def test_preprocess_module_imports_without_bpy():
    """The workflow module must import and gate cleanly when Blender is
    absent (reference requires bpy at import time; ours degrades)."""
    import examples.abc.data_preprocess as dp
    assert callable(dp.copy_to_meshes)
    try:
        import bpy  # noqa: F401
        has_bpy = True
    except Exception:
        has_bpy = False
    if not has_bpy:
        with pytest.raises(RuntimeError, match="bpy"):
            dp.clean_scene()
