"""Decoupled-hierarchy analytic (v, J, H) fast path for the U-Net ('full')
model variants: PipnPpFullModule (reference ``pipn_foam.py:229-290``) and
PiGanoPpFullModule (``pi_gano_pp_full.py:13-77``).

The full variants' FeaturePropagation decoders interpolate features across
internal points, so they previously replayed exact reference-autograd
semantics — measured 0.81 steps/s at the reference envelope
(tools/measure_full_rates.py), which makes 3000-epoch at-scale training
infeasible (~29-49 h per run). This path applies the same principled
decomposition the product-default decoupled PIPN mode uses (BASELINE.md
round 4: accuracy-equivalent at reference data scale):

  * The SA encoder + all-but-last FP levels run as a plain VALUE forward
    (their outputs are spatial FIELDS sampled at coarse points).
  * The last FP level's kNN interpolation is differentiated ANALYTICALLY
    w.r.t. the query coordinates: f(x) = sum_k w_k(x) F_k / sum_k w_k(x)
    with inverse-square-distance weights over the precomputed (static) kNN
    indices — this is the honest spatial derivative of the reconstructed
    field, capturing how the interpolated features vary with position.
  * The level-0 skip block propagates exactly (identity Jacobian on the
    coordinate columns; sdf/boundaryId are separate input tensors whose
    coordinate gradient is zero in the torch reference too).
  * The final shared MLP (and, for PI-GANO++, the branch modulation, which
    is constant per case) propagates (v, J, H) with the standard analytic
    layer rules (physics/analytic.py).

Dropped relative to exact autodiff: the dependence of the COARSE features
F_k on the query point's own coordinates (x_i's contribution rides through
max-pooled SA neighborhoods — the same argmax-coupling class of terms whose
removal the decoupled PIPN mode showed to be accuracy-neutral at data
scale). Parameter gradients still flow through every layer: F_k appears
linearly in (v, J, H), so the loss backpropagates into the whole encoder.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from porous_cfd_tpu.data.foam_data import FoamData, split_contiguous
from porous_cfd_tpu.physics import analytic

_CLAMP = 1e-12  # matches knn_interpolate_with_idx (PARITY.md: torch uses 1e-16)


def _gather(arr, idx):
    return jax.vmap(lambda a, i: a[i])(arr, idx)


def knn_interp_prop(x_coarse, pos_src, pos_query, idx, n_int: int):
    """(value for all rows, J/H for the first ``n_int`` rows) of
    inverse-square-distance kNN interpolation w.r.t. the query coordinates,
    treating the coarse features and positions as context.

    :param x_coarse: (B, M, F) coarse features.
    :param pos_src: (B, M, D) coarse positions.
    :param pos_query: (B, N, D) query positions (internal-first layout).
    :param idx: (B, N, k) precomputed kNN indices into the coarse level.
    :returns: v (B, N, F), j (B, n_int, D, F), h (B, n_int, D, F).

    With S = sum_k w_k F_k and W = sum_k w_k, f = S/W:
      f'  = (S'  - f W') / W
      f'' = (S'' - 2 f' W' - f W'') / W       (per-component, diagonal)
    and for w = 1/u, u = |x - y_k|^2 (clamped at 1e-12, where the weight —
    like the forward's — is constant and its derivative zero):
      dw/dx_d   = -2 w^2 (x_d - y_kd)
      d2w/dx_d2 = 8 w^3 (x_d - y_kd)^2 - 2 w^2
    """
    diff = pos_query[..., :, None, :] - _gather(pos_src, idx)   # (B, N, k, D)
    d2 = jnp.sum(diff * diff, axis=-1)                          # (B, N, k)
    live = (d2 >= _CLAMP).astype(diff.dtype)
    w = 1.0 / jnp.maximum(d2, _CLAMP)
    feats = _gather(x_coarse, idx)                              # (B, N, k, F)
    w_sum = jnp.sum(w, axis=-1, keepdims=True)                  # (B, N, 1)
    v = jnp.sum(feats * w[..., None], axis=-2) / w_sum          # (B, N, F)

    diff_i = diff[..., :n_int, :, :]
    w_i = w[..., :n_int, :] * live[..., :n_int, :]
    f_i = feats[..., :n_int, :, :]
    w2 = w_i * w_i
    dw = -2.0 * w2[..., None] * diff_i                          # (B, Ni, k, D)
    d2w = (8.0 * (w2 * w_i)[..., None] * diff_i * diff_i
           - 2.0 * w2[..., None])                               # (B, Ni, k, D)
    sp = jnp.einsum("...kd,...kf->...df", dw, f_i)              # (B, Ni, D, F)
    spp = jnp.einsum("...kd,...kf->...df", d2w, f_i)
    wp = jnp.sum(dw, axis=-2)                                   # (B, Ni, D)
    wpp = jnp.sum(d2w, axis=-2)
    w_sum_i = w_sum[..., :n_int, :, None]                       # (B, Ni, 1, 1)
    v_i = v[..., :n_int, None, :]                               # (B, Ni, 1, F)
    j = (sp - v_i * wp[..., None]) / w_sum_i
    h = (spp - 2.0 * j * wp[..., None] - v_i * wpp[..., None]) / w_sum_i
    return v, j, h


def _skip_identity_triple(skip_feats, n_int: int, n_dim: int):
    """(v, J, H) of the level-0 skip block [sdf || boundaryId || C]: the
    trailing ``n_dim`` columns are the differentiated coordinates (identity
    Jacobian), everything before them is constant input data."""
    b, n, fw = skip_feats.shape
    eye = jnp.concatenate(
        [jnp.zeros((n_dim, fw - n_dim), skip_feats.dtype),
         jnp.eye(n_dim, dtype=skip_feats.dtype)], axis=-1)      # (D, Fw)
    j = jnp.broadcast_to(eye[None, None], (b, n_int, n_dim, fw))
    return skip_feats, j, jnp.zeros_like(j)


def _fp_level_idx(fp_idx, i, pos_src, pos_query, k):
    """Precomputed kNN indices for FP level ``i``, or on-the-fly kNN when the
    batch carries no U-Net precompute (mirrors the module's fallback)."""
    if fp_idx is not None:
        return fp_idx[i]
    from porous_cfd_tpu.models.neighbors import knn
    idx, _ = jax.vmap(knn, in_axes=(0, 0, None))(pos_src, pos_query, k)
    return idx


def _level_dropout(dropout, i, layers):
    if dropout is None:
        return None
    d = dropout[i]
    if isinstance(d, (int, float)):
        return None if d == 0 else [float(d)] * (len(layers) - 1)
    return list(d)


def _mid_levels_deterministic(dropout, n_levels):
    """The value-stream FP levels run deterministically; the reference
    configs only place dropout on the LAST level, so this is exact. Guard it
    so a config with mid-level dropout falls back to the exact path."""
    if dropout is None:
        return True
    for i in range(n_levels - 1):
        d = dropout[i]
        vals = [d] if isinstance(d, (int, float)) else list(d)
        if any(float(x) != 0.0 for x in vals):
            return False
    return True


def pipn_pp_full_apply_with_derivatives(module):
    """Analytic decoupled-hierarchy fast path for PipnPpFullModule."""
    from porous_cfd_tpu.models.neighbors import (extract_fp_idx,
                                                 extract_sa_neighbors)
    from porous_cfd_tpu.models.set_abstraction import (FeaturePropagation,
                                                       SetAbstractionSeq)

    if not _mid_levels_deterministic(module.dec_dropout,
                                     len(module.dec_layers)):
        return None
    enc = SetAbstractionSeq(module.enc_fraction, module.enc_radius,
                            module.enc_layers, return_skip=True,
                            activation=module.activation,
                            max_neighbors=module.max_neighbors,
                            k_chunks=module.k_chunks, dtype=module.dtype)
    n_fp = len(module.dec_layers)
    mids = [FeaturePropagation(module.dec_k[i], module.dec_layers[i],
                               _level_dropout(module.dec_dropout, i,
                                              module.dec_layers[i]),
                               plain_last=False,
                               activation=module.activation,
                               dtype=module.dtype)
            for i in range(n_fp - 1)]

    def fn(params, batch: FoamData, rng=None, deterministic: bool = True):
        internal_view, boundary_view = split_contiguous(batch)
        x_int = internal_view["C"]
        n_int = x_int.shape[-2]
        pts = jnp.concatenate([x_int, boundary_view["C"]], axis=-2)
        nbrs = extract_sa_neighbors(batch.domain, len(module.enc_radius))
        fp_idx = extract_fp_idx(batch.domain, len(module.dec_k))
        x_in = jnp.concatenate([batch["sdf"], batch["boundaryId"], pts],
                               axis=-1)
        (x, pos), skips = enc.apply({"params": params["encoder"]}, x_in, pts,
                                    True, nbrs)
        for i in range(n_fp - 1):
            x_skip, pos_skip = skips[-(i + 1)]
            idx_i = _fp_level_idx(fp_idx, i, pos, pos_skip, module.dec_k[i])
            x, pos = mids[i].apply({"params": params["decoder"][f"fp_{i}"]},
                                   x, pos, x_skip, pos_skip, True, idx_i)
        idx_last = _fp_level_idx(fp_idx, n_fp - 1, pos, pts,
                                 module.dec_k[n_fp - 1])
        iv, ij, ih = knn_interp_prop(x, pos, pts, idx_last, n_int)
        sv, sj, sh = _skip_identity_triple(x_in, n_int, pts.shape[-1])
        v = jnp.concatenate([iv, sv], axis=-1)
        j = jnp.concatenate([ij, sj], axis=-1)
        h = jnp.concatenate([ih, sh], axis=-1)
        out, j, h = analytic.mlp_prop_merged(
            params["decoder"][f"fp_{n_fp - 1}"]["mlp"],
            module.dec_layers[n_fp - 1], v, j, h, n_int, module.activation,
            dropout=_level_dropout(module.dec_dropout, n_fp - 1,
                                   module.dec_layers[n_fp - 1]),
            last_activation=False, deterministic=deterministic, rng=rng)
        return out, jnp.swapaxes(j, -1, -2), jnp.swapaxes(h, -1, -2)

    return fn


def pi_gano_pp_full_apply_with_derivatives(module):
    """Analytic decoupled-hierarchy fast path for PiGanoPpFullModule: the
    U-Net path above plus the per-level branch modulation — the branch
    embedding is constant per case, so it scales (v, J, H) alike at the last
    level and rides the value stream at the earlier ones."""
    from porous_cfd_tpu.models.neighbors import (extract_fp_idx,
                                                 extract_sa_neighbors)
    from porous_cfd_tpu.models.pi_gano import gather_parameters
    from porous_cfd_tpu.models.pipn import _pointnet_global_dispatch
    from porous_cfd_tpu.models.set_abstraction import (
        FeaturePropagationNeuralOperator, SetAbstractionSeq)

    if not _mid_levels_deterministic(module.fp_dropout,
                                     len(module.dec_layers)):
        return None
    enc = SetAbstractionSeq(module.enc_fraction, module.enc_radius,
                            module.enc_layers, return_skip=True,
                            activation=module.activation,
                            max_neighbors=module.max_neighbors,
                            k_chunks=module.k_chunks, dtype=module.dtype)
    n_fp = len(module.dec_layers)
    mids = [FeaturePropagationNeuralOperator(
                module.dec_k[i], module.dec_layers[i],
                _level_dropout(module.fp_dropout, i, module.dec_layers[i]),
                plain_last=False, activation=module.activation,
                dtype=module.dtype)
            for i in range(n_fp - 1)]

    def fn(params, batch: FoamData, rng=None, deterministic: bool = True):
        internal_view, boundary_view = split_contiguous(batch)
        x_int = internal_view["C"]
        n_int = x_int.shape[-2]
        pts = jnp.concatenate([x_int, boundary_view["C"]], axis=-2)
        act = module.activation
        par_features = batch.domain.get("_gano_par")
        if par_features is None:
            par_features = gather_parameters(batch,
                                             module.variable_boundaries)
        par = _pointnet_global_dispatch(params["branch"]["linear"],
                                        module.branch_layers, par_features,
                                        act)
        nbrs = extract_sa_neighbors(batch.domain, len(module.enc_radius))
        fp_idx = extract_fp_idx(batch.domain, len(module.dec_k))
        x_in = jnp.concatenate([batch["sdf"], batch["boundaryId"], pts],
                               axis=-1)
        (x, pos), skips = enc.apply({"params": params["encoder"]}, x_in, pts,
                                    True, nbrs)
        for i in range(n_fp - 1):
            x_skip, pos_skip = skips[-(i + 1)]
            idx_i = _fp_level_idx(fp_idx, i, pos, pos_skip, module.dec_k[i])
            x, pos = mids[i].apply(
                {"params": params["decoder"][f"fpno_{i}"]}, par, x, pos,
                x_skip, pos_skip, True, idx_i)
        idx_last = _fp_level_idx(fp_idx, n_fp - 1, pos, pts,
                                 module.dec_k[n_fp - 1])
        iv, ij, ih = knn_interp_prop(x, pos, pts, idx_last, n_int)
        sv, sj, sh = _skip_identity_triple(x_in, n_int, pts.shape[-1])
        v = jnp.concatenate([iv, sv], axis=-1)
        j = jnp.concatenate([ij, sj], axis=-1)
        h = jnp.concatenate([ih, sh], axis=-1)
        last = params["decoder"][f"fpno_{n_fp - 1}"]
        out, j, h = analytic.mlp_prop_merged(
            last["mlp"], module.dec_layers[n_fp - 1], v, j, h, n_int, act,
            dropout=_level_dropout(module.fp_dropout, n_fp - 1,
                                   module.dec_layers[n_fp - 1]),
            last_activation=False, deterministic=deterministic, rng=rng)
        par_red = act(par @ last["par_reduce"]["kernel"]
                      + last["par_reduce"]["bias"])              # (B, 1, F)
        out = out * par_red
        j = j * par_red[..., None, :, :]
        h = h * par_red[..., None, :, :]
        return out, jnp.swapaxes(j, -1, -2), jnp.swapaxes(h, -1, -2)

    return fn
