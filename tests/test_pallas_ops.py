"""Pallas kernel tests (interpreter mode on the CPU test platform)."""
import jax.numpy as jnp
import numpy as np

from porous_cfd_tpu.models.neighbors import (batched_fps,
                                             farthest_point_sampling)
from porous_cfd_tpu.ops.fps_pallas import farthest_point_sampling_pallas


def test_pallas_fps_matches_xla_single():
    rng = np.random.default_rng(0)
    pos = jnp.asarray(rng.uniform(-1, 1, size=(200, 2)), jnp.float32)
    idx_xla = farthest_point_sampling(pos, 64)
    idx_pl = farthest_point_sampling_pallas(pos, 64, interpret=True)
    np.testing.assert_array_equal(np.asarray(idx_pl), np.asarray(idx_xla))


def test_pallas_fps_matches_xla_batched():
    rng = np.random.default_rng(1)
    pos = jnp.asarray(rng.uniform(-1, 1, size=(3, 100, 3)), jnp.float32)
    idx_xla = batched_fps(pos, 32, 0)
    idx_pl = farthest_point_sampling_pallas(pos, 32, interpret=True)
    np.testing.assert_array_equal(np.asarray(idx_pl), np.asarray(idx_xla))


def test_pallas_fps_spreads_clusters():
    rng = np.random.default_rng(2)
    centers = np.array([[0, 0], [10, 0], [0, 10], [10, 10]], np.float32)
    pts = np.concatenate([c + 0.1 * rng.normal(size=(25, 2)) for c in centers])
    idx = np.asarray(farthest_point_sampling_pallas(
        jnp.asarray(pts, jnp.float32), 4, interpret=True))
    assert len({int(i) // 25 for i in idx}) == 4
