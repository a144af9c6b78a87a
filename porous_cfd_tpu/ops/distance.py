"""Device-accelerated minimum-distance fields (SDF precompute, interface
distances) with optional point-axis sharding.

The reference computes these O(N*M) pairwise reductions on the host
(``scipy.cdist`` in foam_dataset.py:374, ``torch.cdist`` in
evaluation.py:75-84) — seconds per case for large 3D clouds. Here the
reduction runs on device in query chunks (bounded memory), and for very large
clouds the query axis can be sharded over a mesh's 'points' axis with
``shard_map`` — the honest TPU analog of sequence/context parallelism for this
workload (SURVEY.md section 5.7): each shard owns a slice of the points, the
target cloud is replicated, no collectives needed for the row-wise min.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _chunk_min_dist(query: jnp.ndarray, target: jnp.ndarray,
                    chunk: int) -> jnp.ndarray:
    """Row-wise min euclidean distance, scanning query chunks so the (N, M)
    pairwise matrix never materializes beyond (chunk, M)."""
    n = query.shape[0]
    pad = (-n) % chunk
    q = jnp.pad(query, ((0, pad), (0, 0)))
    q = q.reshape(-1, chunk, q.shape[-1])

    def body(carry, q_blk):
        d2 = (jnp.sum(q_blk * q_blk, -1, keepdims=True)
              - 2.0 * q_blk @ target.T
              + jnp.sum(target * target, -1)[None, :])
        return carry, jnp.sqrt(jnp.maximum(jnp.min(d2, axis=-1), 0.0))

    _, mins = jax.lax.scan(body, None, q)
    return mins.reshape(-1)[:n]


@partial(jax.jit, static_argnums=(2,))
def min_distance(query: jnp.ndarray, target: jnp.ndarray,
                 chunk: int = 2048) -> jnp.ndarray:
    """Min distance from each query point (N, D) to the target cloud (M, D)."""
    return _chunk_min_dist(query, target, min(chunk, query.shape[0]))


def min_distance_sharded(query: jnp.ndarray, target: jnp.ndarray, mesh,
                         chunk: int = 2048) -> jnp.ndarray:
    """Point-sharded variant: the query axis is split over the mesh's 'points'
    axis (padded to a multiple), target replicated."""
    from jax.experimental.shard_map import shard_map
    from jax.sharding import NamedSharding, PartitionSpec as P

    n_shards = mesh.shape["points"]
    n = query.shape[0]
    pad = (-n) % n_shards
    q = jnp.pad(query, ((0, pad), (0, 0)))

    fn = shard_map(
        lambda qs, t: _chunk_min_dist(qs, t, min(chunk, qs.shape[0])),
        mesh=mesh,
        in_specs=(P("points", None), P()),
        out_specs=P("points"))
    out = jax.jit(fn)(
        jax.device_put(q, NamedSharding(mesh, P("points", None))),
        jax.device_put(target, NamedSharding(mesh, P())))
    return out[:n]


def sdf_feature(internal_points: np.ndarray, boundary_points: np.ndarray,
                zone: np.ndarray, mesh=None) -> np.ndarray:
    """The dataset SDF feature (foam_dataset.py:360-381 semantics): min
    distance of every point to the boundary cloud, max-normalized; internal
    porous side negative; boundary rows positive. Device-accelerated."""
    all_points = np.concatenate([internal_points, boundary_points])
    if mesh is not None and mesh.shape.get("points", 1) > 1:
        d = np.asarray(min_distance_sharded(
            jnp.asarray(all_points, jnp.float32),
            jnp.asarray(boundary_points, jnp.float32), mesh))
    else:
        d = np.asarray(min_distance(
            jnp.asarray(all_points, jnp.float32),
            jnp.asarray(boundary_points, jnp.float32)))
    d = d / d.max()
    n_int = len(internal_points)
    sign = np.ones(len(all_points))
    sign[:n_int] = (0.5 - np.asarray(zone).flatten()) * 2
    return d * sign
