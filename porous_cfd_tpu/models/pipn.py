"""PIPN model family (flax modules + PinnModel factories).

Counterparts of the reference models:
  * ``PipnManufactured``(+Pp) (models/pipn/pipn_baseline.py) — physics-only,
    raw coordinates, Tanh, Adam(1e-3, eps=1e-6) + ExpLR(0.9995).
  * ``PipnFoam``          (models/pipn/pipn_foam.py:59-105) — data+physics with
    standardized features, SiLU, Adam(1e-3) + ExpLR(0.999).
  * ``PipnFoamPp``        (pipn_foam.py:108-166) — geometry branch is a
    SetAbstraction stack over boundary points.
  * ``PipnFoamPpMrg``     (pipn_foam.py:169-226) — multi-resolution-grouping
    geometry encoder.
  * ``PipnFoamPpFull``    (pipn_foam.py:229-290) — U-Net style SetAbstraction
    encoder + FeaturePropagation decoder over all points.

All share the PIPN topology: per-point features + a pooled global geometry
embedding, decoded by a shared segmentation MLP.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from porous_cfd_tpu.data.foam_data import FoamData, split_contiguous
from porous_cfd_tpu.models.base import PinnModel
from porous_cfd_tpu.models.mlp import MLP, Activation, PointNetFeatureExtract
from porous_cfd_tpu.models.set_abstraction import (FeaturePropagationSeq,
                                                   PointNetFeatureExtractPp,
                                                   SetAbstractionMrgSeq,
                                                   SetAbstractionSeq)
from porous_cfd_tpu.physics.losses import (ContinuityLoss,
                                           ContinuityLossStandardized,
                                           MomentumLossFixed,
                                           MomentumLossManufactured)

# test hook: exercise the winner-gather coupled path (interpret-mode kernels)
# off-TPU
FORCE_WINNER_GATHER = False


class PipnModule(nn.Module):
    """Classic PIPN forward (pipn_foam.py:87-100): features = [boundaryId||sdf],
    PointNet encoder on the differentiable points, tile global embedding,
    shared decoder MLP."""
    fe_local_layers: Sequence[int]
    fe_global_layers: Sequence[int]
    seg_layers: Sequence[int]
    seg_dropout: Optional[Sequence[float]] = None
    activation: Activation = nn.silu
    dtype: Any = None

    @nn.compact
    def __call__(self, points, batch: FoamData, deterministic: bool = True):
        global_in = jnp.concatenate([batch["boundaryId"], batch["sdf"]], axis=-1)
        local, g = PointNetFeatureExtract(
            self.fe_local_layers, self.fe_global_layers, self.activation,
            dtype=self.dtype, name="feature_extract")(global_in, points, deterministic)
        exp_g = jnp.broadcast_to(g, (*local.shape[:-1], g.shape[-1]))
        seg_in = jnp.concatenate([local, exp_g], axis=-1)
        return MLP(self.seg_layers, self.seg_dropout, self.activation,
                   last_activation=False, dtype=self.dtype,
                   name="decoder")(seg_in, deterministic)


class PipnPpModule(nn.Module):
    """PIPN++ forward (pipn_foam.py:148-161): geometry branch = SetAbstraction
    stack over boundary points with [C || boundaryId] features; local shared
    MLP on the differentiable points; tiled concat; decoder.

    ``geom_features_order`` matches the reference concat order, which differs
    between the foam ("C_first") and manufactured ("id_first") variants
    (pipn_foam.py:154 vs pipn_baseline.py:110)."""
    fe_local_layers: Sequence[int]
    fe_global_layers: Sequence[Sequence[int]]
    fe_radius: Sequence[float]
    fe_fraction: Sequence[float]
    seg_layers: Sequence[int]
    seg_dropout: Optional[Sequence[float]] = None
    activation: Activation = nn.silu
    max_neighbors: int = 64
    geom_features_order: str = "C_first"
    dtype: Any = None

    @nn.compact
    def __call__(self, points, batch: FoamData, deterministic: bool = True):
        boundary = batch["boundary"]
        b_pos = boundary["C"]
        b_id = boundary["boundaryId"]
        if self.geom_features_order == "C_first":
            geom = jnp.concatenate([b_pos, b_id], axis=-1)
        else:
            geom = jnp.concatenate([b_id, b_pos], axis=-1)
        from porous_cfd_tpu.models.neighbors import extract_sa_neighbors
        nbrs = extract_sa_neighbors(batch.domain, len(self.fe_radius))
        local, g = PointNetFeatureExtractPp(
            self.fe_local_layers, self.fe_global_layers, self.fe_fraction,
            self.fe_radius, self.activation, self.max_neighbors,
            dtype=self.dtype, name="feature_extract")(
            geom, b_pos, points, deterministic, nbrs)
        exp_g = jnp.broadcast_to(g, (*local.shape[:-1], g.shape[-1]))
        seg_in = jnp.concatenate([local, exp_g], axis=-1)
        return MLP(self.seg_layers, self.seg_dropout, self.activation,
                   last_activation=False, dtype=self.dtype,
                   name="decoder")(seg_in, deterministic)


class PipnPpMrgModule(nn.Module):
    """PIPN++ MRG forward (pipn_foam.py:207-221): multi-resolution-grouping
    geometry encoder over boundary points."""
    n_dims: int
    mrg_in_features: int
    fe_local_layers: Sequence[int]
    seg_layers: Sequence[int]
    seg_dropout: Optional[Sequence[float]] = None
    activation: Activation = nn.silu
    max_neighbors: int = 64
    dtype: Any = None

    @nn.compact
    def __call__(self, points, batch: FoamData, deterministic: bool = True):
        local = MLP(self.fe_local_layers, activation=self.activation,
                    dtype=self.dtype, name="local_fe")(points, deterministic)
        boundary = batch["boundary"]
        geom = jnp.concatenate([boundary["boundaryId"], boundary["C"]], axis=-1)
        from porous_cfd_tpu.models.neighbors import extract_sa_neighbors
        nbrs = extract_sa_neighbors(batch.domain, 2)
        g = SetAbstractionMrgSeq(
            self.mrg_in_features, self.n_dims, self.activation,
            self.max_neighbors, dtype=self.dtype, name="global_fe")(
            geom, boundary["C"], deterministic, nbrs)
        exp_g = jnp.broadcast_to(g, (*local.shape[:-1], g.shape[-1]))
        seg_in = jnp.concatenate([local, exp_g], axis=-1)
        return MLP(self.seg_layers, self.seg_dropout, self.activation,
                   last_activation=False, dtype=self.dtype,
                   name="decoder")(seg_in, deterministic)


class PipnPpFullModule(nn.Module):
    """Full U-Net PIPN++ (pipn_foam.py:270-285): SetAbstraction encoder over
    ALL points with [sdf || boundaryId || C] features, FeaturePropagation
    decoder back to full resolution."""
    enc_layers: Sequence[Sequence[int]]
    enc_radius: Sequence[float]
    enc_fraction: Sequence[float]
    dec_layers: Sequence[Sequence[int]]
    dec_k: Sequence[int]
    dec_dropout: Optional[Sequence[Any]] = None
    activation: Activation = nn.silu
    max_neighbors: int = 64
    k_chunks: int = 8  # bound SA neighborhood temporaries (2nd-order graphs)
    dtype: Any = None

    @nn.compact
    def __call__(self, points, batch: FoamData, deterministic: bool = True):
        from porous_cfd_tpu.models.neighbors import (extract_fp_idx,
                                                     extract_sa_neighbors)
        nbrs = extract_sa_neighbors(batch.domain, len(self.enc_radius))
        fp_idx = extract_fp_idx(batch.domain, len(self.dec_k))
        x_in = jnp.concatenate([batch["sdf"], batch["boundaryId"], points],
                               axis=-1)
        (x, pos), skips = SetAbstractionSeq(
            self.enc_fraction, self.enc_radius, self.enc_layers,
            return_skip=True, activation=self.activation,
            max_neighbors=self.max_neighbors, k_chunks=self.k_chunks,
            dtype=self.dtype,
            name="encoder")(x_in, points, deterministic, nbrs)
        y, _ = FeaturePropagationSeq(
            self.dec_layers, self.dec_k, self.dec_dropout, self.activation,
            dtype=self.dtype, name="decoder")(x, pos, skips, deterministic,
                                              fp_idx)
        return y


def _decoder_prop_dispatch(params, layers, n_local, v, jt, ht, v_b, g, act,
                           dropout, deterministic, rng,
                           jctx_t=None, hctx_t=None):
    """Decoder-stack propagation: the fused Pallas kernel on TPU (weights +
    every layer intermediate VMEM-resident — the step is HBM-bound, see
    ops/decoder_pallas.py), the XLA closed-form path elsewhere.

    Derivatives use the TRANSPOSED layout end to end: ``jt``/``ht`` arrive as
    (..., D, Ni, L) from ``analytic.mlp_prop_t`` and the result is returned
    directly in the engine's (..., Ni, O, D) convention — no layout copies
    around the kernel (TPU transposes of narrow-lane tensors are expensive).
    ``jctx_t``/``hctx_t`` (..., D, Ni, G) carry the max-pool argmax coupling
    of the pooled context (nonzero only at winner rows).
    Returns (out_merged, jac, lap)."""
    from porous_cfd_tpu.ops import decoder_pallas
    from porous_cfd_tpu.physics import analytic

    nl = len(layers) - 1
    if (decoder_pallas.on_tpu() and decoder_pallas.supported(act)
            and (dropout is None or float(dropout[nl - 1]) == 0.0)):
        return decoder_pallas.decoder_prop(
            params, layers, n_local, v, jt, ht, v_b, g, act, dropout=dropout,
            deterministic=deterministic, rng=rng,
            jctx_t=jctx_t, hctx_t=hctx_t)
    j = jnp.swapaxes(jt, -3, -2)
    h = jnp.swapaxes(ht, -3, -2)
    jc = None if jctx_t is None else jnp.swapaxes(jctx_t, -3, -2)
    hc = None if hctx_t is None else jnp.swapaxes(hctx_t, -3, -2)
    out, j, h = analytic.decoder_prop(
        params, layers, n_local, v, j, h, v_b, g, act, dropout=dropout,
        last_activation=False, deterministic=deterministic, rng=rng,
        j_ctx=jc, h_ctx=hc)
    return out, jnp.swapaxes(j, -1, -2), jnp.swapaxes(h, -1, -2)


def _pointnet_global_dispatch(params, layers, x, act):
    """max-pooled value MLP over points: fused Pallas kernel on TPU (only the
    (B, 1, F) running max/argmax ever leaves VMEM — ops/pointnet_pallas.py),
    XLA elsewhere."""
    from porous_cfd_tpu.ops import pointnet_pallas
    from porous_cfd_tpu.physics import analytic

    if pointnet_pallas.on_tpu() and pointnet_pallas.supported(act):
        return pointnet_pallas.pointnet_global(params, layers, x, act)
    g = analytic.mlp_value(params, layers, x, act)
    return jnp.max(g, axis=-2, keepdims=True)


def pipn_apply_with_derivatives(module: PipnModule, coupled: bool = True):
    """Build the analytic fast-path derivative function for a PipnModule
    (see physics/analytic.py): forward + per-point J/H in one (1+2D)x-forward
    pass instead of nested autodiff. Returns
    ``fn(params, batch, rng, deterministic) -> (out_full, jac, lap)`` with the
    engine's conventions (jac/lap shaped (..., Ni, O, D)).

    Max-pool coupling (``coupled=True``, default): the pooled global feature
    g depends on the differentiated internal coordinates through each
    channel's argmax row, so the TRUE per-point derivative at a winner row i
    includes the chain through g: dg_c/dx_i = dq_c(x_i)/dx_i iff
    i = argmax_r q_c(x_r). This path propagates (v, J, H) through the
    global-feature chain at the winner rows and feeds the result to the
    decoder as context-block input derivatives — the activation rules
    downstream then produce all D_gg/D_lg cross terms of the exact per-point
    Jacobian/Hessian-diagonal (verified against brute-force per-point
    autodiff). ``coupled=False`` treats g as locally constant (~1.4x faster;
    both settings reach the <5% CFD accuracy target on the golden duct,
    CONVERGENCE.md, so this is a principled-exactness-vs-speed knob, not an
    accuracy one). Deviation from the torch reference's grad-of-SUM
    semantics remains only in genuinely cross-point terms (sum-aggregated
    sensitivities at winner rows), see PARITY.md."""
    from porous_cfd_tpu.physics import analytic

    def fn(params, batch: FoamData, rng=None, deterministic: bool = True):
        internal_view, boundary_view = split_contiguous(batch)
        x_int = internal_view["C"]
        x_bnd = boundary_view["C"]
        n_int = x_int.shape[-2]
        feats = jnp.concatenate([batch["boundaryId"], batch["sdf"]], axis=-1)
        feats_i = feats[..., :n_int, :]
        feats_b = feats[..., n_int:, :]
        act = module.activation
        fe = params["feature_extract"]

        j0, h0 = analytic.identity_jacobian_t(x_int)
        lv_i, lj, lh = analytic.mlp_prop_t(fe["local_feature"],
                                           module.fe_local_layers,
                                           x_int, j0, h0, act)
        lv_b = analytic.mlp_value(fe["local_feature"], module.fe_local_layers,
                                  x_bnd, act)

        if not coupled:  # context-constant speed mode
            local_all = jnp.concatenate([lv_i, lv_b], axis=-2)
            g = _pointnet_global_dispatch(
                fe["global_feature"], module.fe_global_layers,
                jnp.concatenate([local_all, feats], axis=-1), act)
            return _decoder_prop_dispatch(
                params["decoder"], module.seg_layers, lv_i.shape[-1],
                lv_i, lj, lh, lv_b, g, act,
                module.seg_dropout, deterministic, rng)

        # fused-kernel route: pointnet kernel for (g, argmax), winner-row
        # gathering for the coupled context terms, decoder kernel with
        # additive layer-0 J/H — avoids materializing any (B, D, N, F_global)
        # tensor in HBM
        from porous_cfd_tpu.ops import decoder_pallas
        nl_seg = len(module.seg_layers) - 1
        if ((decoder_pallas.on_tpu() or FORCE_WINNER_GATHER)
                and decoder_pallas.supported(act)
                and (module.seg_dropout is None
                     or float(module.seg_dropout[nl_seg - 1]) == 0.0)):
            w0 = params["decoder"]["linear_0"]["kernel"]
            n_local = lv_i.shape[-1]
            g, zj0, zh0 = _winner_gather_ctx(
                fe, module, lv_i, lj, lh, lv_b, feats_i, feats_b,
                w0[n_local:], act)
            return decoder_pallas.decoder_prop(
                params["decoder"], module.seg_layers, n_local, lv_i, lj, lh,
                lv_b, g, act, dropout=module.seg_dropout,
                deterministic=deterministic, rng=rng,
                j0_add=zj0, h0_add=zh0)

        # global-feature chain WITH derivatives on the internal rows (the
        # extra feature columns are constant -> zero J/H seed)
        zf = jnp.zeros((*lj.shape[:-1], feats_i.shape[-1]), lj.dtype)
        gv_i, gjt, ght = analytic.mlp_prop_t(
            fe["global_feature"], module.fe_global_layers,
            jnp.concatenate([lv_i, feats_i], axis=-1),
            jnp.concatenate([lj, zf], axis=-1),
            jnp.concatenate([lh, zf], axis=-1), act)
        gv_b = analytic.mlp_value(
            fe["global_feature"], module.fe_global_layers,
            jnp.concatenate([lv_b, feats_b], axis=-1), act)

        gv = jnp.concatenate([gv_i, gv_b], axis=-2)
        g = jnp.max(gv, axis=-2, keepdims=True)
        winner = jnp.argmax(gv, axis=-2)                      # (..., F)
        # winner mask over internal rows (boundary winners contribute no
        # derivative); (..., Ni, F) -> broadcast over the leading D axis
        mask = (winner[..., None, :]
                == jnp.arange(n_int)[:, None]).astype(gjt.dtype)
        jctx_t = gjt * mask[..., None, :, :]
        hctx_t = ght * mask[..., None, :, :]

        return _decoder_prop_dispatch(
            params["decoder"], module.seg_layers, lv_i.shape[-1],
            lv_i, lj, lh, lv_b, g, act,
            module.seg_dropout, deterministic, rng,
            jctx_t=jctx_t, hctx_t=hctx_t)

    return fn


def _winner_gather_ctx(fe, module, lv_i, lj, lh, lv_b, feats_i, feats_b,
                       w0g, act):
    """Max-pool-coupled context terms via winner gathering.

    The dense formulation materializes (B, D, N, F_global) context J/H
    tensors that are zero everywhere except at pooling-winner rows. Here the
    fused pointnet kernel returns (g, argmax); ONLY the F winner rows' local
    chains are gathered (one-hot matmuls — MXU-friendly, no TPU gathers) and
    propagated through the global-feature chain, where the last layer is
    contracted directly to each winner's own channel (a (K,) dot per channel
    instead of the full (K, F) matmul). The layer-0 additive terms
    ``zj0/zh0 = (mask ⊙ Jfe) @ W0g`` are then assembled with one einsum and
    fed to the decoder kernel, which adds them to the first layer's
    pre-activation J/H — mathematically identical to the dense path
    (tests/test_analytic.py::test_winner_gather_matches_dense).

    Returns (g, zj0_add, zh0_add) with the add terms shaped (B, D, Ni, F1).
    """
    from porous_cfd_tpu.ops import pointnet_pallas
    from porous_cfd_tpu.physics import analytic

    layers = list(module.fe_global_layers)
    params = fe["global_feature"]
    g_in = jnp.concatenate([
        jnp.concatenate([lv_i, feats_i], -1),
        jnp.concatenate([lv_b, feats_b], -1)], axis=-2)
    g, amax = pointnet_pallas.pointnet_global(params, layers, g_in, act,
                                              return_argmax=True)
    winner = amax[..., 0, :]                          # (B, F)
    n_int = lv_i.shape[-2]
    internal_mask = (winner < n_int).astype(lv_i.dtype)
    w_safe = jnp.minimum(winner, n_int - 1)

    onehot = jax.nn.one_hot(w_safe, n_int, dtype=lv_i.dtype)   # (B, F, Ni)
    sel_v = jnp.einsum("bfn,bnl->bfl", onehot, lv_i)
    sel_j = jnp.einsum("bfn,bdnl->bdfl", onehot, lj)
    sel_h = jnp.einsum("bfn,bdnl->bdfl", onehot, lh)
    sel_f = jnp.einsum("bfn,bnl->bfl", onehot, feats_i)
    zf = jnp.zeros((*sel_j.shape[:-1], sel_f.shape[-1]), sel_j.dtype)

    # chain through all but the last dense layer (every layer activated)
    nl = len(layers) - 1
    head = {f"linear_{i}": params[f"linear_{i}"] for i in range(nl - 1)}
    qv, qj, qh = analytic.mlp_prop_t(
        head, layers[:-1],
        jnp.concatenate([sel_v, sel_f], -1),
        jnp.concatenate([sel_j, zf], -1),
        jnp.concatenate([sel_h, zf], -1), act)
    # last dense, contracted to each winner row's OWN channel + activation
    wl = params[f"linear_{nl - 1}"]["kernel"]          # (K, F)
    bl = params[f"linear_{nl - 1}"]["bias"]
    zv = jnp.einsum("bfk,kf->bf", qv, wl) + bl
    zjw = jnp.einsum("bdfk,kf->bdf", qj, wl)
    zhw = jnp.einsum("bdfk,kf->bdf", qh, wl)
    rules = analytic.ACTIVATION_RULES[act]
    _, d1, d2 = rules(zv)
    hw = (d2[:, None] * zjw * zjw + d1[:, None] * zhw) * internal_mask[:, None]
    jw = d1[:, None] * zjw * internal_mask[:, None]

    zj0 = jnp.einsum("bfn,bdf,fo->bdno", onehot, jw, w0g)
    zh0 = jnp.einsum("bfn,bdf,fo->bdno", onehot, hw, w0g)
    return g, zj0, zh0


def pipn_pp_apply_with_derivatives(module):
    """Analytic fast path for PipnPpModule / PipnPpMrgModule. Their pooled
    geometry embedding is computed from BOUNDARY points only
    (pipn_foam.py:154-155, 215-216), which are not differentiated — so unlike
    plain PIPN this path matches the exact autodiff semantics EVERYWHERE
    (no argmax coupling on the differentiated inputs). Supported for the
    plain and MRG variants; the U-Net ('full') variant interpolates across
    internal points and keeps the exact path."""
    from porous_cfd_tpu.models.set_abstraction import (SetAbstractionMrgSeq,
                                                       SetAbstractionSeq)
    from porous_cfd_tpu.physics import analytic

    is_mrg = isinstance(module, PipnPpMrgModule)
    if is_mrg:
        geom_seq = SetAbstractionMrgSeq(module.mrg_in_features, module.n_dims,
                                        module.activation,
                                        module.max_neighbors,
                                        dtype=module.dtype)
        local_layers = module.fe_local_layers
        local_params_key = ("local_fe",)
        geom_params_key = "global_fe"
    else:
        geom_seq = SetAbstractionSeq(module.fe_fraction, module.fe_radius,
                                     module.fe_global_layers,
                                     return_skip=False,
                                     activation=module.activation,
                                     max_neighbors=module.max_neighbors,
                                     dtype=module.dtype)
        local_layers = module.fe_local_layers
        local_params_key = ("feature_extract", "local_feature")
        geom_params_key = ("feature_extract", "global_feature")

    def get_sub(params, key):
        if isinstance(key, tuple):
            for k in key:
                params = params[k]
            return params
        return params[key]

    def fn(params, batch: FoamData, rng=None, deterministic: bool = True):
        internal_view, boundary_view = split_contiguous(batch)
        x_int = internal_view["C"]
        x_bnd = boundary_view["C"]
        act = module.activation
        boundary = boundary_view
        from porous_cfd_tpu.ops import sa_pallas
        if is_mrg:
            geom_in = jnp.concatenate([boundary["boundaryId"], boundary["C"]],
                                      axis=-1)
            from porous_cfd_tpu.models.neighbors import extract_sa_neighbors
            nbrs = extract_sa_neighbors(batch.domain, 2)
            if sa_pallas.enabled(act, nbrs):
                g = sa_pallas.sa_mrg_fused(
                    get_sub(params, geom_params_key), module.mrg_in_features,
                    module.n_dims, act, module.max_neighbors, geom_in, x_bnd,
                    nbrs)
            else:
                g = geom_seq.apply({"params": get_sub(params,
                                                      geom_params_key)},
                                   geom_in, x_bnd, deterministic, nbrs)
        else:
            if module.geom_features_order == "C_first":
                geom_in = jnp.concatenate([boundary["C"],
                                           boundary["boundaryId"]], axis=-1)
            else:
                geom_in = jnp.concatenate([boundary["boundaryId"],
                                           boundary["C"]], axis=-1)
            from porous_cfd_tpu.models.neighbors import extract_sa_neighbors
            nbrs = extract_sa_neighbors(batch.domain, len(module.fe_radius))
            if sa_pallas.enabled(act, nbrs):
                g = sa_pallas.sa_seq_fused(
                    get_sub(params, geom_params_key), module.fe_fraction,
                    module.fe_radius, module.fe_global_layers,
                    module.max_neighbors, act, geom_in, x_bnd, nbrs)
            else:
                g, _ = geom_seq.apply({"params": get_sub(params,
                                                         geom_params_key)},
                                      geom_in, x_bnd, deterministic, nbrs)

        local_params = get_sub(params, local_params_key)
        j0, h0 = analytic.identity_jacobian_t(x_int)
        lv_i, lj, lh = analytic.mlp_prop_t(local_params, local_layers,
                                           x_int, j0, h0, act)
        lv_b = analytic.mlp_value(local_params, local_layers, x_bnd, act)

        return _decoder_prop_dispatch(
            params["decoder"], module.seg_layers, lv_i.shape[-1],
            lv_i, lj, lh, lv_b, g, act,
            module.seg_dropout, deterministic, rng)

    return fn


def pipn_manufactured(nu: float, d: float, f: float,
                      fe_local_layers: Sequence[int],
                      fe_global_layers: Sequence[int],
                      seg_layers: Sequence[int],
                      activation: Activation = nn.tanh,
                      dtype: Any = None,
                      fast_derivatives: bool = False,
                      coupled_context: bool = True) -> PinnModel:
    """Physics-only PIPN on raw coordinates (pipn_baseline.py:12-63).
    Note: the reference's feature extractor always uses Tanh here (its
    ``activation`` arg is only applied to the decoder, pipn_baseline.py:39-40);
    we apply ``activation`` uniformly."""
    module = PipnModule(fe_local_layers, fe_global_layers, seg_layers,
                        None, activation, dtype=dtype)
    return PinnModel(
        module=module,
        dims=seg_layers[-1] - 1,
        momentum_loss=MomentumLossManufactured(nu, d, f),
        continuity_loss=ContinuityLoss(),
        enable_data_loss=False,
        learning_rate=1e-3, lr_gamma=0.9995, adam_eps=1e-6,
        derivative_apply=(pipn_apply_with_derivatives(module, coupled_context)
                          if fast_derivatives else None))


def pipn_foam(nu: float, d: float, f: float,
              fe_local_layers: Sequence[int],
              fe_global_layers: Sequence[int],
              seg_layers: Sequence[int],
              scalers: dict,
              seg_dropout: Optional[Sequence[float]] = None,
              activation: Activation = nn.silu,
              dtype: Any = None,
              fast_derivatives: bool = True,
              coupled_context: bool = False) -> PinnModel:
    """Data+physics PIPN with standardized features (pipn_foam.py:15-105).

    ``coupled_context`` defaults to False (round 4): the decoupled-context
    analytic path is the PRODUCT DEFAULT — held-out accuracy-equivalent to
    the max-pool-coupled mode at reference data scale (621-case CFD grid,
    CONVERGENCE.md) and ~1.5x faster (speed-of-light vs its dot-model floor,
    PARITY.md ROOFLINE). Pass True (CLI: --coupled-context) to replicate the
    torch reference's grad-of-max coupling semantics exactly. The physics-
    only ``pipn_manufactured`` keeps the coupled default: it is the
    verification experiment, where reference-exact semantics matter most."""
    module = PipnModule(fe_local_layers, fe_global_layers, seg_layers,
                        seg_dropout, activation, dtype=dtype)
    u_s, p_s, c_s = scalers["U"], scalers["p"], scalers["C"]
    return PinnModel(
        module=module,
        dims=seg_layers[-1] - 1,
        momentum_loss=MomentumLossFixed(nu, d, f, u_s, c_s, p_s),
        continuity_loss=ContinuityLossStandardized(u_s, c_s),
        enable_data_loss=True,
        u_scaler=u_s, p_scaler=p_s,
        learning_rate=1e-3, lr_gamma=0.999,
        derivative_apply=(pipn_apply_with_derivatives(module, coupled_context)
                          if fast_derivatives else None))


def _boundary_sa_precompute(fractions, radii, max_neighbors,
                            feats_order: str | None = None):
    """Dataset-level precompute closure for boundary-cloud SA chains.

    ``feats_order`` names the model's level-0 input assembly ("C_first" /
    "id_first", matching the geometry-branch concat) so the static input
    features can be pre-gathered per neighborhood (sa_xg_0) — the fused SA
    kernel then skips its per-step one-hot gather at level 0 entirely."""
    from porous_cfd_tpu.models.neighbors import sa_chain_precompute

    def fn(dataset: FoamData):
        _, boundary = split_contiguous(dataset)
        feats = None
        if feats_order == "C_first":
            feats = jnp.concatenate([boundary["C"], boundary["boundaryId"]],
                                    axis=-1)
        elif feats_order == "id_first":
            feats = jnp.concatenate([boundary["boundaryId"], boundary["C"]],
                                    axis=-1)
        return sa_chain_precompute(boundary["C"], fractions, radii,
                                   max_neighbors, feats=feats)

    return fn


def _foam_model(module, dims, nu, d, f, scalers,
                derivative_apply=None, neighbor_precompute=None) -> PinnModel:
    u_s, p_s, c_s = scalers["U"], scalers["p"], scalers["C"]
    return PinnModel(
        module=module, dims=dims,
        momentum_loss=MomentumLossFixed(nu, d, f, u_s, c_s, p_s),
        continuity_loss=ContinuityLossStandardized(u_s, c_s),
        enable_data_loss=True, u_scaler=u_s, p_scaler=p_s,
        learning_rate=1e-3, lr_gamma=0.999,
        derivative_apply=derivative_apply,
        neighbor_precompute=neighbor_precompute)


def pipn_manufactured_pp(nu: float, d: float, f: float,
                         fe_local_layers, fe_global_layers,
                         fe_global_radius, fe_global_fraction, seg_layers,
                         activation: Activation = nn.tanh,
                         max_neighbors: int = 64, dtype: Any = None,
                         fast_derivatives: bool = True) -> PinnModel:
    """Physics-only PIPN++ (pipn_baseline.py:66-124). Fast path exact
    (see pipn_foam_pp)."""
    module = PipnPpModule(fe_local_layers, fe_global_layers, fe_global_radius,
                          fe_global_fraction, seg_layers, None, activation,
                          max_neighbors, geom_features_order="id_first",
                          dtype=dtype)
    return PinnModel(
        module=module, dims=seg_layers[-1] - 1,
        momentum_loss=MomentumLossManufactured(nu, d, f),
        continuity_loss=ContinuityLoss(),
        enable_data_loss=False,
        learning_rate=1e-3, lr_gamma=0.9995, adam_eps=1e-6,
        derivative_apply=(pipn_pp_apply_with_derivatives(module)
                          if fast_derivatives else None),
        neighbor_precompute=_boundary_sa_precompute(
            fe_global_fraction, fe_global_radius, max_neighbors,
            feats_order="id_first"))


def pipn_foam_pp(nu: float, d: float, f: float,
                 fe_local_layers, fe_global_layers, fe_radius, fe_fraction,
                 seg_layers, scalers: dict, seg_dropout=None,
                 activation: Activation = nn.silu,
                 max_neighbors: int = 64, dtype: Any = None,
                 fast_derivatives: bool = True) -> PinnModel:
    """PIPN++ with standardized features (pipn_foam.py:108-166). The analytic
    fast path is EXACT for this family (geometry pooled over boundary points
    only) and on by default."""
    module = PipnPpModule(fe_local_layers, fe_global_layers, fe_radius,
                          fe_fraction, seg_layers, seg_dropout, activation,
                          max_neighbors, geom_features_order="C_first",
                          dtype=dtype)
    return _foam_model(module, seg_layers[-1] - 1, nu, d, f, scalers,
                       pipn_pp_apply_with_derivatives(module)
                       if fast_derivatives else None,
                       _boundary_sa_precompute(fe_fraction, fe_radius,
                                               max_neighbors,
                                               feats_order="C_first"))


def pipn_foam_pp_mrg(n_dims: int, mrg_in_features: int,
                     nu: float, d: float, f: float,
                     fe_local_layers, seg_layers, scalers: dict,
                     seg_dropout=None, activation: Activation = nn.silu,
                     max_neighbors: int = 64, dtype: Any = None,
                     fast_derivatives: bool = True) -> PinnModel:
    """PIPN++ MRG (pipn_foam.py:169-226). Fast path exact (see pipn_foam_pp).
    The MRG grouping chain over the (static) boundary cloud is precomputed per
    run: one 2-level (0.5, 0.5)/(0.125, 1.0) chain covers branch 1 and —
    because FPS is deterministic — branch 2's identical (0.5, 0.5) level."""
    module = PipnPpMrgModule(n_dims, mrg_in_features, fe_local_layers,
                             seg_layers, seg_dropout, activation,
                             max_neighbors, dtype=dtype)
    from porous_cfd_tpu.models.set_abstraction import SetAbstractionMrgSeq
    return _foam_model(module, seg_layers[-1] - 1, nu, d, f, scalers,
                       pipn_pp_apply_with_derivatives(module)
                       if fast_derivatives else None,
                       _boundary_sa_precompute(SetAbstractionMrgSeq.fractions,
                                               SetAbstractionMrgSeq.radii,
                                               max_neighbors,
                                               feats_order="id_first"))


def _all_points_unet_precompute(fractions, radii, max_neighbors, dec_k,
                                has_global):
    """Precompute closure for U-Net chains over ALL points. The point clouds
    are static, so SA centroids/graphs and FP kNN indices never change; only
    the (differentiable) interpolation weights are recomputed per step."""
    from porous_cfd_tpu.models.neighbors import unet_chain_precompute

    def fn(dataset: FoamData):
        internal_view, boundary_view = split_contiguous(dataset)
        pos = jnp.concatenate([internal_view["C"], boundary_view["C"]],
                              axis=-2)
        return unet_chain_precompute(pos, fractions, radii, max_neighbors,
                                     dec_k, has_global)

    return fn


def pipn_foam_pp_full(nu: float, d: float, f: float,
                      enc_layers, enc_radius, enc_fraction,
                      dec_layers, dec_k, scalers: dict, dec_dropout=None,
                      activation: Activation = nn.silu,
                      max_neighbors: int = 64, dtype: Any = None,
                      fast_derivatives: bool = True) -> PinnModel:
    """U-Net PIPN++ (pipn_foam.py:229-290). SA/FP neighbor structures over the
    (static) point clouds are precomputed per run. The default derivative
    path is the decoupled-hierarchy analytic one (models/fp_analytic.py —
    exact autodiff measures 0.81 steps/s at the reference envelope);
    ``fast_derivatives=False`` restores the exact reference-autograd replay
    (remat + case micro-batching to fit its second-order graphs)."""
    module = PipnPpFullModule(enc_layers, enc_radius, enc_fraction, dec_layers,
                              dec_k, dec_dropout, activation, max_neighbors,
                              dtype=dtype)
    derivative_apply = None
    if fast_derivatives:
        from porous_cfd_tpu.models.fp_analytic import \
            pipn_pp_full_apply_with_derivatives
        derivative_apply = pipn_pp_full_apply_with_derivatives(module)
    model = _foam_model(module, dec_layers[-1][-1] - 1, nu, d, f, scalers,
                        derivative_apply=derivative_apply,
                        neighbor_precompute=_all_points_unet_precompute(
                            enc_fraction, enc_radius, max_neighbors, dec_k,
                            len(enc_layers) > len(enc_radius)))
    if derivative_apply is not None:
        return model
    import dataclasses as _dc
    return _dc.replace(model, remat=True, microbatch=2)
