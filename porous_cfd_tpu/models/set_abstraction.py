"""PointNet++ building blocks: SetAbstraction / FeaturePropagation stacks.

Dense, static-shape counterparts of the reference's PyG-based modules
(``models/modules.py:277-614``). Where the reference flattens (B,N,F) into
PyG's edge-list format and calls torch_cluster fps/radius CUDA kernels, these
operate on dense batched arrays with padded+masked neighborhoods (see
``porous_cfd_tpu.models.neighbors``), which XLA tiles onto the MXU.

Semantics notes vs the reference:
  * relative positions are normalized as (pos_j - pos_i) / r; the reference's
    ``PointConvNext.message`` computes ``pos_j - pos_i / r`` due to operator
    precedence (modules.py:287) — we implement the intended normalization.
  * FPS starts at index 0 (deterministic) instead of a random start.
  * aggregation over empty neighborhoods yields 0, like PyG scatter-max.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from porous_cfd_tpu.models.mlp import MLP, Activation
from porous_cfd_tpu.models.neighbors import (batched_fps,
                                             batched_knn_interpolate,
                                             batched_knn_interpolate_with_idx,
                                             batched_radius, fps_count,
                                             masked_max)


def _gather_points(arr: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """arr (B, N, F), idx (B, ...) -> (B, ..., F)."""
    return jax.vmap(lambda a, i: a[i])(arr, idx)


class SetAbstraction(nn.Module):
    """fps -> radius graph -> shared MLP on [x_j || (pos_j - pos_i)/r] ->
    masked max over neighbors (modules.py:295-325).

    Input/output are dense: (B, N, F), (B, N, D) -> (B, C, F'), (B, C, D)
    with C = ceil(ratio * N).
    """
    ratio: float
    r: float
    mlp_layers: Sequence[int]
    max_neighbors: int = 64
    activation: Activation = nn.tanh
    k_chunks: int = 1
    dtype: Any = None

    @nn.compact
    def __call__(self, x, pos, deterministic: bool = True, neighbors=None):
        """``neighbors``: optional precomputed (centroids, idx, mask) from
        ``neighbors.sa_chain_precompute`` — point clouds are static, so the
        FPS/radius structures can be computed once per run.

        ``k_chunks > 1`` aggregates the neighbor axis in chunks with a running
        max, dividing the peak (B, C, K, F') temporary by the chunk count —
        required for the U-Net variants' second-order graphs at reference
        point counts (their full-K temporaries exceed HBM)."""
        if neighbors is not None:
            centroids, idx, mask = neighbors[:3]
            pos_c = _gather_points(pos, centroids)
        else:
            n = pos.shape[-2]
            n_centroids = fps_count(n, self.ratio)
            centroids = batched_fps(pos, n_centroids, 0)       # (B, C)
            pos_c = _gather_points(pos, centroids)             # (B, C, D)
            idx, mask = batched_radius(pos, pos_c, self.r, self.max_neighbors)

        mlp = MLP(self.mlp_layers, activation=self.activation,
                  dtype=self.dtype, name="conv_mlp")
        k = idx.shape[-1]
        chunks = self.k_chunks if (self.k_chunks > 1
                                   and k % self.k_chunks == 0) else 1
        step = k // chunks
        neg = jnp.finfo(jnp.float32).min
        out = None
        for c in range(chunks):
            sl = slice(c * step, (c + 1) * step)
            neigh_x = _gather_points(x, idx[..., sl])          # (B, C, k', F)
            neigh_pos = _gather_points(pos, idx[..., sl])
            rel = (neigh_pos - pos_c[..., None, :]) / self.r
            msg = jnp.concatenate([neigh_x, rel], axis=-1)
            h = mlp(msg, deterministic)                        # (B, C, k', F')
            m = jnp.max(jnp.where(mask[..., sl, None], h, neg), axis=-2)
            out = m if out is None else jnp.maximum(out, m)
        any_valid = jnp.any(mask, axis=-1)[..., None]
        out = jnp.where(any_valid, out, 0.0)                   # (B, C, F')
        return out, pos_c


class GlobalSetAbstraction(nn.Module):
    """MLP on [x || pos] + global max-pool -> single descriptor per cloud
    (modules.py:403-423)."""
    mlp_layers: Sequence[int]
    activation: Activation = nn.tanh
    dtype: Any = None

    @nn.compact
    def __call__(self, x, pos, deterministic: bool = True):
        h = MLP(self.mlp_layers, activation=self.activation, dtype=self.dtype,
                name="mlp")(jnp.concatenate([x, pos], axis=-1), deterministic)
        out = jnp.max(h, axis=-2, keepdims=True)               # (B, 1, F')
        pos_out = jnp.zeros((*pos.shape[:-2], 1, pos.shape[-1]), pos.dtype)
        return out, pos_out


class SetAbstractionSeq(nn.Module):
    """Sequence of SetAbstraction layers, with an optional trailing
    GlobalSetAbstraction when len(conv_mlp) > len(radius)
    (modules.py:483-527). Returns (x, pos) and, when return_skip, the list of
    per-layer inputs for U-Net style decoders."""
    fraction: Sequence[float]
    radius: Sequence[float]
    conv_mlp: Sequence[Sequence[int]]
    return_skip: bool = True
    activation: Activation = nn.tanh
    max_neighbors: int = 64
    k_chunks: int = 1
    dtype: Any = None

    @nn.compact
    def __call__(self, x, pos, deterministic: bool = True, neighbors=None):
        skips = [(x, pos)]
        for i, (f, r, layers) in enumerate(
                zip(self.fraction, self.radius, self.conv_mlp)):
            x, pos = SetAbstraction(f, r, layers, self.max_neighbors,
                                    self.activation, self.k_chunks,
                                    dtype=self.dtype,
                                    name=f"sa_{i}")(
                x, pos, deterministic,
                neighbors[i] if neighbors is not None else None)
            skips.append((x, pos))
        if len(self.conv_mlp) > len(self.radius):
            x, pos = GlobalSetAbstraction(self.conv_mlp[-1], self.activation,
                                          dtype=self.dtype, name="global_sa")(
                x, pos, deterministic)
            skips.append((x, pos))
        return ((x, pos), skips[:-1]) if self.return_skip else (x, pos)


class SetAbstractionMrgSeq(nn.Module):
    """Multi-resolution-grouping encoder: four branches whose global
    descriptors are concatenated (modules.py:426-480). Layer sizes follow the
    reference/paper exactly.

    ``neighbors``: optional 2-level precomputed SA chain over ``pos`` with
    (fraction, radius) = (0.5, 0.5), (0.125, 1.0). Branch 2's grouping
    (0.5, 0.5) is bit-identical to branch 1's first level (FPS start is
    deterministic), so one chain serves all three radius-SA layers.
    """
    in_features: int
    n_dims: int
    activation: Activation = nn.tanh
    max_neighbors: int = 64
    dtype: Any = None

    # the 2-level chain shared by branch1 (both levels) and branch2 (level 0)
    fractions = (0.5, 0.125)
    radii = (0.5, 1.0)

    @nn.compact
    def __call__(self, x, pos, deterministic: bool = True, neighbors=None):
        kw = dict(max_neighbors=self.max_neighbors, activation=self.activation,
                  dtype=self.dtype)
        nb0, nb1 = neighbors if neighbors is not None else (None, None)
        d = self.n_dims
        x1, p1 = SetAbstraction(0.5, 0.5, [self.in_features + d, 64, 128],
                                name="branch1_sa0", **kw)(x, pos, deterministic,
                                                          nb0)
        x1, p1 = SetAbstraction(0.125, 1.0, [128 + d, 256],
                                name="branch1_sa1", **kw)(x1, p1, deterministic,
                                                          nb1)
        x2, p2 = SetAbstraction(0.5, 0.5, [self.in_features + d, 64, 128, 256],
                                name="branch2_sa", **kw)(x, pos, deterministic,
                                                         nb0)
        x3, _ = GlobalSetAbstraction([self.in_features + d, 128, 256, 512],
                                     self.activation, dtype=self.dtype,
                                     name="branch3_gsa")(x, pos, deterministic)
        x12 = jnp.concatenate([x1, x2], axis=-2)
        p12 = jnp.concatenate([p1, p2], axis=-2)
        x4, _ = GlobalSetAbstraction([256 + d, 512], self.activation,
                                     dtype=self.dtype, name="branch4_gsa")(
            x12, p12, deterministic)
        return jnp.concatenate([x3, x4], axis=-1)              # (B, 1, 1024)


class FeaturePropagation(nn.Module):
    """kNN-interpolate coarse features to the skip resolution, concat skip
    features, shared MLP (modules.py:328-356)."""
    k: int
    mlp_layers: Sequence[int]
    dropout: Optional[Sequence[float]] = None
    plain_last: bool = False
    activation: Activation = nn.tanh
    dtype: Any = None

    @nn.compact
    def __call__(self, x, pos, x_skip, pos_skip, deterministic: bool = True,
                 knn_idx=None):
        if knn_idx is not None:
            x_up = batched_knn_interpolate_with_idx(x, pos, pos_skip, knn_idx)
        else:
            x_up = batched_knn_interpolate(x, pos, pos_skip, self.k)
        if x_skip is not None:
            x_up = jnp.concatenate([x_up, x_skip], axis=-1)
        y = MLP(self.mlp_layers, self.dropout, self.activation,
                last_activation=not self.plain_last, dtype=self.dtype,
                name="mlp")(x_up, deterministic)
        return y, pos_skip


class FeaturePropagationSeq(nn.Module):
    """Stack of FeaturePropagation layers walking the skip list backwards;
    the last layer is plain (modules.py:530-569)."""
    fp_layers: Sequence[Sequence[int]]
    k: Sequence[int]
    dropout: Optional[Sequence[Any]] = None
    activation: Activation = nn.tanh
    dtype: Any = None

    def _dropout(self, i):
        if self.dropout is None:
            return None
        d = self.dropout[i]
        if isinstance(d, (int, float)):
            return None if d == 0 else [float(d)] * (len(self.fp_layers[i]) - 1)
        return list(d)

    @nn.compact
    def __call__(self, x, pos, skips, deterministic: bool = True,
                 knn_idx=None):
        for i, (layers, k) in enumerate(zip(self.fp_layers, self.k)):
            x_skip, pos_skip = skips[-(i + 1)]
            is_last = i == len(self.fp_layers) - 1
            x, pos = FeaturePropagation(
                k, layers, self._dropout(i), plain_last=is_last,
                activation=self.activation, dtype=self.dtype,
                name=f"fp_{i}")(x, pos, x_skip, pos_skip, deterministic,
                                knn_idx[i] if knn_idx is not None else None)
        return x, pos


class FeaturePropagationNeuralOperator(nn.Module):
    """FeaturePropagation whose output is modulated by a dimensionally-reduced
    branch embedding (modules.py:359-400)."""
    k: int
    mlp_layers: Sequence[int]
    dropout: Optional[Sequence[float]] = None
    plain_last: bool = False
    activation: Activation = nn.tanh
    dtype: Any = None

    @nn.compact
    def __call__(self, par_embedding, x, pos, x_skip, pos_skip,
                 deterministic: bool = True, knn_idx=None):
        if knn_idx is not None:
            x_up = batched_knn_interpolate_with_idx(x, pos, pos_skip, knn_idx)
        else:
            x_up = batched_knn_interpolate(x, pos, pos_skip, self.k)
        if x_skip is not None:
            x_up = jnp.concatenate([x_up, x_skip], axis=-1)
        y = MLP(self.mlp_layers, self.dropout, self.activation,
                last_activation=not self.plain_last, dtype=self.dtype,
                name="mlp")(x_up, deterministic)
        par = nn.Dense(self.mlp_layers[-1], dtype=self.dtype,
                       name="par_reduce")(par_embedding)
        par = self.activation(par)
        return y * par, pos_skip


class FeaturePropagationNeuralOperatorSeq(nn.Module):
    """Stack of FP-NeuralOperator layers (modules.py:572-614)."""
    fp_layers: Sequence[Sequence[int]]
    k: Sequence[int]
    dropout: Optional[Sequence[Any]] = None
    activation: Activation = nn.tanh
    dtype: Any = None

    def _dropout(self, i):
        if self.dropout is None:
            return None
        d = self.dropout[i]
        if isinstance(d, (int, float)):
            return None if d == 0 else [float(d)] * (len(self.fp_layers[i]) - 1)
        return list(d)

    @nn.compact
    def __call__(self, par_embedding, x, pos, skips, deterministic: bool = True,
                 knn_idx=None):
        for i, (layers, k) in enumerate(zip(self.fp_layers, self.k)):
            x_skip, pos_skip = skips[-(i + 1)]
            is_last = i == len(self.fp_layers) - 1
            x, pos = FeaturePropagationNeuralOperator(
                k, layers, self._dropout(i), plain_last=is_last,
                activation=self.activation, dtype=self.dtype,
                name=f"fpno_{i}")(par_embedding, x, pos, x_skip, pos_skip,
                                  deterministic,
                                  knn_idx[i] if knn_idx is not None else None)
        return x, pos


class PointNetFeatureExtractPp(nn.Module):
    """PIPN++ encoder: local shared MLP on all points + SetAbstraction global
    branch over the geometry (boundary) cloud (modules.py:101-139)."""
    local_layers: Sequence[int]
    global_layers: Sequence[Sequence[int]]
    global_fraction: Sequence[float]
    global_radius: Sequence[float]
    activation: Activation = nn.tanh
    max_neighbors: int = 64
    dtype: Any = None

    @nn.compact
    def __call__(self, geom_features, geom_pos, global_pos,
                 deterministic: bool = True, neighbors=None):
        local = MLP(self.local_layers, activation=self.activation,
                    dtype=self.dtype, name="local_feature")(global_pos,
                                                            deterministic)
        g, _ = SetAbstractionSeq(
            self.global_fraction, self.global_radius, self.global_layers,
            return_skip=False, activation=self.activation,
            max_neighbors=self.max_neighbors, dtype=self.dtype,
            name="global_feature")(geom_features, geom_pos, deterministic,
                                   neighbors)
        return local, g


class GeometryEncoderPp(nn.Module):
    """PI-GANO++ geometry encoder = SetAbstraction stack ending in a global
    descriptor (modules.py:142-168)."""
    fraction: Sequence[float]
    radius: Sequence[float]
    conv_mlp: Sequence[Sequence[int]]
    activation: Activation = nn.silu
    max_neighbors: int = 64
    dtype: Any = None

    @nn.compact
    def __call__(self, x, pos, deterministic: bool = True, neighbors=None):
        g, _ = SetAbstractionSeq(
            self.fraction, self.radius, self.conv_mlp, return_skip=False,
            activation=self.activation, max_neighbors=self.max_neighbors,
            dtype=self.dtype, name="set_abstraction")(x, pos, deterministic,
                                                      neighbors)
        return g
