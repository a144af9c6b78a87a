"""Neighbor-kernel tests, cross-checked against brute-force numpy (and thereby
the torch_cluster semantics they replace)."""
import jax.numpy as jnp
import numpy as np

from porous_cfd_tpu.models.neighbors import (farthest_point_sampling, fps_count,
                                             knn, knn_interpolate, masked_max,
                                             pairwise_sqdist, radius_neighbors)


def test_pairwise_sqdist():
    rng = np.random.default_rng(0)
    a = rng.normal(size=(5, 3)).astype(np.float32)
    b = rng.normal(size=(7, 3)).astype(np.float32)
    expect = ((a[:, None] - b[None]) ** 2).sum(-1)
    np.testing.assert_allclose(pairwise_sqdist(jnp.asarray(a), jnp.asarray(b)),
                               expect, atol=1e-4)


def test_fps_spreads_points():
    # clusters far apart: fps must pick one from each before refining
    rng = np.random.default_rng(1)
    centers = np.array([[0, 0], [10, 0], [0, 10], [10, 10]], np.float32)
    pts = np.concatenate([c + 0.1 * rng.normal(size=(25, 2)) for c in centers])
    idx = np.asarray(farthest_point_sampling(jnp.asarray(pts, jnp.float32), 4))
    picked_clusters = {int(i) // 25 for i in idx}
    assert len(picked_clusters) == 4
    assert len(set(idx.tolist())) == 4  # no duplicates


def test_fps_first_is_start():
    pts = jnp.asarray(np.random.default_rng(2).normal(size=(10, 2)), jnp.float32)
    idx = farthest_point_sampling(pts, 3, start_idx=4)
    assert int(idx[0]) == 4


def test_fps_count_matches_torch_cluster_ceil():
    assert fps_count(100, 0.5) == 50
    assert fps_count(101, 0.5) == 51
    assert fps_count(3, 0.125) == 1


def test_radius_neighbors_brute_force():
    rng = np.random.default_rng(3)
    src = rng.uniform(0, 1, size=(50, 2)).astype(np.float32)
    q = src[:8]
    r, k = 0.3, 64
    idx, mask = radius_neighbors(jnp.asarray(src), jnp.asarray(q), r, k)
    for i in range(8):
        expect = set(np.nonzero(((src - q[i]) ** 2).sum(-1) <= r * r)[0].tolist())
        got = set(np.asarray(idx[i])[np.asarray(mask[i])].tolist())
        assert got == expect


def test_radius_neighbors_cap_prefers_low_index():
    src = jnp.zeros((10, 2), jnp.float32)  # all at origin
    q = jnp.zeros((1, 2), jnp.float32)
    idx, mask = radius_neighbors(src, q, 0.5, 4)
    assert mask.all()
    np.testing.assert_array_equal(np.sort(np.asarray(idx[0])), [0, 1, 2, 3])


def test_knn_and_interpolate():
    rng = np.random.default_rng(4)
    src = rng.uniform(0, 1, size=(30, 2)).astype(np.float32)
    x = rng.normal(size=(30, 4)).astype(np.float32)
    q = rng.uniform(0, 1, size=(6, 2)).astype(np.float32)
    idx, d2 = knn(jnp.asarray(src), jnp.asarray(q), 3)
    for i in range(6):
        expect = np.argsort(((src - q[i]) ** 2).sum(-1))[:3]
        assert set(np.asarray(idx[i]).tolist()) == set(expect.tolist())
    out = knn_interpolate(jnp.asarray(x), jnp.asarray(src), jnp.asarray(q), 3)
    # brute-force torch_geometric semantics
    for i in range(6):
        d = ((src - q[i]) ** 2).sum(-1)
        nn3 = np.argsort(d)[:3]
        w = 1.0 / np.maximum(d[nn3], 1e-16)
        expect = (x[nn3] * w[:, None]).sum(0) / w.sum()
        np.testing.assert_allclose(out[i], expect, rtol=1e-4)


def test_knn_interpolate_exact_hit():
    """Query exactly on a source point -> returns that point's feature."""
    src = jnp.asarray([[0.0, 0.0], [1.0, 0.0], [0.0, 1.0]], jnp.float32)
    x = jnp.asarray([[1.0], [2.0], [3.0]], jnp.float32)
    out = knn_interpolate(x, src, src[:1], 3)
    np.testing.assert_allclose(out, [[1.0]], atol=1e-5)


def test_masked_max():
    v = jnp.asarray([[[1.0, 5.0], [2.0, -3.0], [9.0, 0.0]]])
    m = jnp.asarray([[[True], [True], [False]]])
    out = masked_max(v, m)
    np.testing.assert_allclose(out, [[2.0, 5.0]])
    m_none = jnp.zeros((1, 3, 1), bool)
    np.testing.assert_allclose(masked_max(v, m_none), [[0.0, 0.0]])
