"""Device min-distance ops: correctness vs numpy, chunking, point-sharded
variant on the 8-device mesh, SDF parity with the dataset's host computation."""
import jax.numpy as jnp
import numpy as np

from porous_cfd_tpu.ops.distance import (min_distance, min_distance_sharded,
                                         sdf_feature)
from porous_cfd_tpu.parallel.mesh import make_mesh


def brute(query, target):
    return np.linalg.norm(query[:, None] - target[None], axis=-1).min(-1)


def test_min_distance_matches_numpy():
    rng = np.random.default_rng(0)
    q = rng.normal(size=(500, 3)).astype(np.float32)
    t = rng.normal(size=(120, 3)).astype(np.float32)
    out = np.asarray(min_distance(jnp.asarray(q), jnp.asarray(t), 128))
    np.testing.assert_allclose(out, brute(q, t), atol=1e-4)


def test_min_distance_odd_sizes():
    rng = np.random.default_rng(1)
    q = rng.normal(size=(77, 2)).astype(np.float32)
    t = rng.normal(size=(13, 2)).astype(np.float32)
    out = np.asarray(min_distance(jnp.asarray(q), jnp.asarray(t), 32))
    np.testing.assert_allclose(out, brute(q, t), atol=1e-4)


def test_min_distance_sharded():
    rng = np.random.default_rng(2)
    q = rng.normal(size=(333, 2)).astype(np.float32)
    t = rng.normal(size=(40, 2)).astype(np.float32)
    mesh = make_mesh(data=1, points=8)
    out = np.asarray(min_distance_sharded(jnp.asarray(q), jnp.asarray(t),
                                          mesh, chunk=64))
    np.testing.assert_allclose(out, brute(q, t), atol=1e-4)


def test_sdf_feature_matches_dataset_host_path():
    """Device SDF equals the FoamDataset host implementation."""
    rng = np.random.default_rng(3)
    pts_i = rng.uniform(size=(80, 2))
    pts_b = rng.uniform(size=(30, 2))
    zone = (pts_i[:, 0] > 0.5).astype(float)

    sdf_dev = sdf_feature(pts_i, pts_b, zone)

    # host reference (dataset.add_sdf math)
    allp = np.concatenate([pts_i, pts_b])
    d = np.linalg.norm(allp[:, None] - pts_b[None], axis=-1).min(-1)
    d = d / d.max()
    sign = np.ones(len(allp))
    sign[:80] = (0.5 - zone) * 2
    np.testing.assert_allclose(sdf_dev, d * sign, atol=1e-5)
    assert np.all(sdf_dev[80:] >= 0)
