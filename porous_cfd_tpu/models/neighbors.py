"""Static-shape point-cloud neighbor ops: FPS, radius search, kNN interpolate.

TPU-native replacements for the torch_cluster/torch_geometric CUDA kernels the
reference leans on (``models/modules.py:7-8,320-321,352``):

  * ``farthest_point_sampling``  <- torch_cluster.fps
  * ``radius_neighbors``         <- torch_cluster.radius (max_num_neighbors cap)
  * ``knn`` / ``knn_interpolate``<- torch_geometric.nn.knn_interpolate

All run on dense ``(N, D)`` arrays with *static* output shapes (padded +
masked), which is what XLA needs; sparsity is expressed through masks instead
of variable-length edge lists. Batched variants are vmapped.

Deviations from torch_cluster, documented:
  * FPS starts from point 0 instead of a random start (deterministic;
    torch_cluster defaults to random_start=True).
  * ``radius`` returns the K nearest-by-index neighbors within r (torch_cluster
    returns the first K encountered in index order — same set).
"""
from __future__ import annotations

import math


import jax
import jax.numpy as jnp


def pairwise_sqdist(query: jnp.ndarray, src: jnp.ndarray) -> jnp.ndarray:
    """Squared euclidean distances (..., M, N) between query (..., M, D) and
    src (..., N, D). Uses the |a|^2 - 2ab + |b|^2 expansion so the inner term
    rides the MXU."""
    q2 = jnp.sum(query * query, axis=-1, keepdims=True)
    s2 = jnp.sum(src * src, axis=-1, keepdims=True)
    cross = jnp.einsum("...md,...nd->...mn", query, src)
    d2 = q2 - 2.0 * cross + jnp.swapaxes(s2, -1, -2)
    return jnp.maximum(d2, 0.0)


def farthest_point_sampling(pos: jnp.ndarray, n_samples: int,
                            start_idx: int = 0) -> jnp.ndarray:
    """Iterative farthest-point sampling over pos (N, D) -> (n_samples,) int32.

    O(n_samples * N): each step updates the running min-distance-to-selected
    field and argmaxes it — fully vectorized, compiles to a fori_loop.
    """
    n = pos.shape[0]

    def body(i, carry):
        selected, min_d2 = carry
        last = selected[i - 1]
        d2 = jnp.sum((pos - pos[last]) ** 2, axis=-1)
        min_d2 = jnp.minimum(min_d2, d2)
        selected = selected.at[i].set(jnp.argmax(min_d2).astype(jnp.int32))
        return selected, min_d2

    selected = jnp.zeros((n_samples,), jnp.int32).at[0].set(start_idx)
    init_d2 = jnp.sum((pos - pos[start_idx]) ** 2, axis=-1)
    selected, _ = jax.lax.fori_loop(1, n_samples, body, (selected, init_d2))
    return selected


def fps_count(n: int, ratio: float) -> int:
    """Number of centroids torch_cluster.fps selects for a given ratio."""
    return max(1, math.ceil(n * ratio))


def radius_neighbors(src: jnp.ndarray, query: jnp.ndarray, r: float,
                     max_neighbors: int):
    """Fixed-radius neighbor search: for each query point return up to
    ``max_neighbors`` source indices with distance <= r.

    :param src: (N, D) candidate points.
    :param query: (C, D) query (centroid) points.
    :return: (idx (C, K) int32, mask (C, K) bool). Padded entries point at 0
        with mask False.
    """
    n = src.shape[0]
    d2 = pairwise_sqdist(query, src)  # (C, N)
    within = d2 <= r * r
    # lowest-index-first selection: score = N - index for in-radius points
    scores = jnp.where(within, n - jax.lax.broadcasted_iota(jnp.int32, d2.shape, 1), 0)
    k_eff = min(max_neighbors, n)
    top, idx = jax.lax.top_k(scores, k_eff)
    mask = top > 0
    idx = jnp.where(mask, idx, 0).astype(jnp.int32)
    if k_eff < max_neighbors:  # pad to the requested static width
        pad = max_neighbors - k_eff
        idx = jnp.pad(idx, ((0, 0), (0, pad)))
        mask = jnp.pad(mask, ((0, 0), (0, pad)))
    return idx, mask


def knn(src: jnp.ndarray, query: jnp.ndarray, k: int):
    """k nearest neighbors of each query among src; k is clamped to the source
    size (torch_geometric returns fewer neighbors when N < k, e.g. when
    interpolating from a GlobalSetAbstraction's single descriptor).

    Selection uses the MXU-friendly expansion-form distances, but the returned
    distances are recomputed in difference form: exact zeros on self-hits, so
    downstream 1/d^2 interpolation weights clamp cleanly instead of exploding
    through second derivatives (the expansion form leaves ~1e-7 cancellation
    residue whose inverse-square second derivative overflows float32).

    :return: (idx (M, k') int32, sqdist (M, k')) with k' = min(k, N)."""
    d2 = pairwise_sqdist(query, src)
    _, idx = jax.lax.top_k(-d2, min(k, src.shape[-2]))
    idx = idx.astype(jnp.int32)
    diff = query[..., :, None, :] - src[idx]          # (M, k', D)
    return idx, jnp.sum(diff * diff, axis=-1)


def knn_interpolate(x: jnp.ndarray, pos_src: jnp.ndarray, pos_query: jnp.ndarray,
                    k: int = 3) -> jnp.ndarray:
    """Inverse-squared-distance kNN interpolation (torch_geometric
    ``knn_interpolate`` semantics: weights 1/clamp(d^2, min)).

    The clamp floor is 1e-12 rather than torch's 1e-16: this framework takes
    SECOND derivatives through the interpolation (PDE residuals), and the
    curvature term 2/floor^3 must stay finite in float32 (2e48 -> inf -> NaN at
    exact self-hits with the torch floor; 2e36 is fine). Exact hits clamp, so
    their weight gradient is zero — same behavior as torch's clamp.

    :param x: (N, F) features at pos_src (N, D).
    :param pos_query: (M, D) target positions.
    :return: (M, F) interpolated features.
    """
    idx, d2 = knn(pos_src, pos_query, k)
    w = 1.0 / jnp.maximum(d2, 1e-12)              # (M, k)
    neigh = x[idx]                                 # (M, k, F)
    return jnp.sum(neigh * w[..., None], axis=-2) / jnp.sum(w, axis=-1, keepdims=True)


# Batched variants (leading batch axis), used by the dense modules.
batched_fps = jax.vmap(farthest_point_sampling, in_axes=(0, None, None))
batched_radius = jax.vmap(radius_neighbors, in_axes=(0, 0, None, None))
batched_knn_interpolate = jax.vmap(knn_interpolate, in_axes=(0, 0, 0, None))


def sa_chain_precompute(pos: jnp.ndarray, fractions, radii, max_neighbors: int,
                        feats: jnp.ndarray | None = None):
    """Precompute the SetAbstraction chain's neighbor structures for a STATIC
    point cloud: FPS centroids + radius neighborhoods per level.

    Point clouds never change across training epochs (each case is resampled
    once at dataset load), so these purely-geometric structures can be computed
    once per run instead of every forward — the sequential FPS argmax loop is
    the latency bottleneck of the ++ model families.

    :param pos: (B, N, D) source cloud (typically boundary points).
    :param feats: optional (B, N, F_in) level-0 input features. These are raw
        DATA (coords/boundaryId), constant across steps, so their neighborhood
        gather can happen here once instead of per step: the fused SA kernel
        then runs its first layer directly on the pre-gathered rows
        (``sa_xg_0``), eliminating the per-step one-hot gather matmul — the
        dominant FLOP term of the ++ families (C*K*N*F1 -> C*K*F_in*F1).
    :return: dict of arrays {'sa_cent_i': (B, C_i), 'sa_idx_i': (B, C_i, K),
        'sa_mask_i': (B, C_i, K)} suitable for merging into FoamData.domain.
    """
    out = {}
    for i, (f, r) in enumerate(zip(fractions, radii)):
        n = pos.shape[-2]
        cent = batched_fps(pos, fps_count(n, f), 0)
        pos_c = jax.vmap(lambda a, i_: a[i_])(pos, cent)
        idx, mask = batched_radius(pos, pos_c, r, max_neighbors)
        out[f"sa_cent_{i}"] = cent
        out[f"sa_idx_{i}"] = idx
        out[f"sa_mask_{i}"] = mask
        # normalized relative positions are purely geometric -> precompute
        # once per run (TPU gathers are slow; doing this per training step
        # dominated the ++-family step time, see ops/sa_pallas.py)
        neigh_pos = jax.vmap(lambda a, i_: a[i_])(pos, idx)
        out[f"sa_rel_{i}"] = ((neigh_pos - pos_c[..., None, :]) / r
                              ).astype(jnp.float32)
        out[f"sa_posc_{i}"] = pos_c.astype(jnp.float32)
        if i == 0 and feats is not None:
            xg = jax.vmap(lambda a, i_: a[i_])(feats, idx)  # (B, C, K, F_in)
            out["sa_xg_0"] = xg.reshape(xg.shape[0], -1,
                                        xg.shape[-1]).astype(jnp.float32)
        pos = pos_c
    return out


def extract_sa_neighbors(domain: dict, n_layers: int):
    """Pull a precomputed SA chain (sa_chain_precompute keys) out of a
    FoamData domain dict; None when absent (compute on the fly). Entries are
    (centroids, idx, mask) optionally extended with (rel, posc, xg): the
    static relative positions, centroid positions, and (level 0 only) the
    pre-gathered static input features."""
    if "sa_cent_0" not in domain:
        return None
    out = []
    for i in range(n_layers):
        entry = (domain[f"sa_cent_{i}"], domain[f"sa_idx_{i}"],
                 domain[f"sa_mask_{i}"])
        if f"sa_rel_{i}" in domain:
            entry = entry + (domain[f"sa_rel_{i}"],)
        if f"sa_posc_{i}" in domain:
            entry = entry + (domain[f"sa_posc_{i}"],)
        if i == 0 and "sa_xg_0" in domain and len(entry) == 5:
            entry = entry + (domain["sa_xg_0"],)
        out.append(entry)
    return out


def unet_chain_precompute(pos: jnp.ndarray, fractions, radii,
                          max_neighbors: int, dec_k, has_global: bool):
    """Neighbor structures for a U-Net SA encoder + FP decoder over a STATIC
    cloud: the SA chain (as sa_chain_precompute) plus the kNN indices of each
    FeaturePropagation level. Indices are discrete (gradient-free), so caching
    them is semantically identical to per-step recomputation; the
    interpolation WEIGHTS stay differentiable (recomputed from the indices).

    :param dec_k: k per FP level (decoder walks the skip list backwards).
    :param has_global: encoder ends in a GlobalSetAbstraction level.
    :return: domain-aux dict with sa_* keys and fp_idx_i keys.
    """
    out = sa_chain_precompute(pos, fractions, radii, max_neighbors)
    level_pos = [pos]
    for i in range(len(fractions)):
        level_pos.append(jax.vmap(lambda a, c: a[c])(
            level_pos[-1], out[f"sa_cent_{i}"]))
    if has_global:
        level_pos.append(jnp.zeros((pos.shape[0], 1, pos.shape[-1]),
                                   pos.dtype))
    # FP level i interpolates from level (L-i) down to level (L-i-1)
    n_levels = len(level_pos)
    for i, k in enumerate(dec_k):
        src = level_pos[n_levels - 1 - i]
        query = level_pos[n_levels - 2 - i]
        idx, _ = jax.vmap(knn, in_axes=(0, 0, None))(src, query, k)
        out[f"fp_idx_{i}"] = idx
    return out


def extract_fp_idx(domain: dict, n_layers: int):
    if "fp_idx_0" not in domain:
        return None
    return [domain[f"fp_idx_{i}"] for i in range(n_layers)]


def knn_interpolate_with_idx(x: jnp.ndarray, pos_src: jnp.ndarray,
                             pos_query: jnp.ndarray, idx: jnp.ndarray
                             ) -> jnp.ndarray:
    """knn_interpolate with precomputed neighbor indices; the inverse-square
    weights are recomputed (differentiable) from the positions."""
    diff = pos_query[..., :, None, :] - pos_src[idx]
    d2 = jnp.sum(diff * diff, axis=-1)
    w = 1.0 / jnp.maximum(d2, 1e-12)
    neigh = x[idx]
    return jnp.sum(neigh * w[..., None], axis=-2) / jnp.sum(w, axis=-1,
                                                            keepdims=True)


batched_knn_interpolate_with_idx = jax.vmap(knn_interpolate_with_idx)


def masked_max(values: jnp.ndarray, mask: jnp.ndarray, axis: int = -2):
    """Max over ``axis`` counting only masked-in entries; all-masked-out groups
    yield 0 (the scatter-max default the torch reference inherits from
    PyG aggregation over empty neighborhoods)."""
    neg = jnp.finfo(values.dtype).min
    filled = jnp.where(mask, values, neg)
    out = jnp.max(filled, axis=axis)
    any_valid = jnp.any(mask, axis=axis)
    return jnp.where(any_valid, out, 0.0)
