"""PI-GANO model family: geometry-aware branch/trunk neural operators.

Counterparts of the reference models (``models/pi_gano/``):
  * ``PiGano``       (pi_gano.py:11-74)  — geometry encoder (max-pool MLP on
    [boundaryId || sdf] + coords), points encoder MLP, branch net on variable-BC
    features, NeuralOperator trunk (each layer modulated by the branch
    embedding), linear reduction.
  * ``PiGanoFull``   (pi_gano.py:77-136) — original PI-GANO: one NeuralOperator
    stack per output variable, sum-reduced.
  * ``PiGanoPp``     (pi_gano_pp.py:13-87)   — geometry encoder replaced by a
    SetAbstraction stack over boundary points.
  * ``PiGanoPpFull`` (pi_gano_pp_full.py:13-77) — SetAbstraction encoder +
    FeaturePropagation-NeuralOperator decoder.

All use ``MomentumLossVariable`` (per-point d/f coefficient fields) and gather
branch inputs from the ``variable_boundaries`` spec: for each subdomain, the
coordinates concatenated with the listed variable features
(``pi_gano/base.py:60-73``).

The reference detaches the coordinates feeding the geometry encoder
(pi_gano.py:59, pi_gano_pp.py:71-72) — here ``stop_gradient``.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from porous_cfd_tpu.data.foam_data import FoamData, split_contiguous
from porous_cfd_tpu.models.base import PinnModel
from porous_cfd_tpu.models.mlp import (MLP, Activation, Branch,
                                       GeometryEncoder,
                                       NeuralOperatorSequential)
from porous_cfd_tpu.models.set_abstraction import (
    FeaturePropagationNeuralOperatorSeq, GeometryEncoderPp, SetAbstractionSeq)
from porous_cfd_tpu.physics.losses import (ContinuityLossStandardized,
                                           MomentumLossVariable)

VariableBoundaries = dict


def gather_parameters(batch: FoamData, variable_boundaries: VariableBoundaries):
    """Branch-net input: per variable subdomain, [C || features...] rows
    concatenated along the point axis (pi_gano/base.py:60-73)."""
    parts = []
    for subdomain in variable_boundaries["Subdomains"]:
        sub = batch[subdomain]
        cols = [sub["C"]]
        for feature in variable_boundaries["Features"]:
            cols.append(sub[feature])
        parts.append(jnp.concatenate(cols, axis=-1))
    return jnp.concatenate(parts, axis=-2)


class PiGanoModule(nn.Module):
    """PI-GANO forward (pi_gano.py:49-69)."""
    out_features: int
    branch_layers: Sequence[int]
    geometry_layers: Sequence[int]
    local_layers: Sequence[int]
    n_operators: int
    operator_dropout: Sequence[float]
    variable_boundaries: VariableBoundaries
    activation: Activation = nn.silu
    full: bool = False  # PiGanoFull: one trunk per output, sum-reduced
    dtype: Any = None

    @nn.compact
    def __call__(self, points, batch: FoamData, deterministic: bool = True):
        geom_in = jnp.concatenate([batch["boundaryId"], batch["sdf"]], axis=-1)
        param_features = gather_parameters(batch, self.variable_boundaries)

        geom = GeometryEncoder(self.geometry_layers, self.activation,
                               dtype=self.dtype, name="geometry_encoder")(
            geom_in, jax.lax.stop_gradient(points), deterministic)
        local = MLP(self.local_layers, None, self.activation, dtype=self.dtype,
                    name="points_encoder")(points, deterministic)
        geom = jnp.broadcast_to(geom, (*local.shape[:-1], geom.shape[-1]))

        operator_in = jnp.concatenate([local, geom], axis=-1)
        par = Branch(self.branch_layers, self.activation, dtype=self.dtype,
                     name="branch")(param_features, deterministic)

        n_feat = self.geometry_layers[-1] + self.local_layers[-1]
        if self.full:
            outs = []
            for i in range(self.out_features):
                y = NeuralOperatorSequential(
                    self.n_operators, n_feat, self.operator_dropout,
                    self.activation, last_activation=False, dtype=self.dtype,
                    name=f"neural_ops_{i}")(operator_in, par, deterministic)
                outs.append(jnp.sum(y, axis=-1, keepdims=True))
            return jnp.concatenate(outs, axis=-1)
        y = NeuralOperatorSequential(
            self.n_operators, n_feat, self.operator_dropout, self.activation,
            dtype=self.dtype, name="neural_ops")(operator_in, par, deterministic)
        return nn.Dense(self.out_features, dtype=self.dtype, name="reduction")(y)


class PiGanoPpModule(nn.Module):
    """PI-GANO++ forward (pi_gano_pp.py:62-82): SetAbstraction geometry encoder
    over boundary points with [C || boundaryId] features."""
    out_features: int
    branch_layers: Sequence[int]
    geometry_layers: Sequence[Sequence[int]]
    geometry_radius: Sequence[float]
    geometry_fraction: Sequence[float]
    local_layers: Sequence[int]
    n_operators: int
    operator_dropout: Sequence[float]
    variable_boundaries: VariableBoundaries
    activation: Activation = nn.silu
    max_neighbors: int = 64
    dtype: Any = None

    @nn.compact
    def __call__(self, points, batch: FoamData, deterministic: bool = True):
        param_features = gather_parameters(batch, self.variable_boundaries)
        b_pos = jax.lax.stop_gradient(batch["boundary"]["C"])
        geom_in = jnp.concatenate([b_pos, batch["boundary"]["boundaryId"]],
                                  axis=-1)
        from porous_cfd_tpu.models.neighbors import extract_sa_neighbors
        nbrs = extract_sa_neighbors(batch.domain, len(self.geometry_radius))
        geom = GeometryEncoderPp(
            self.geometry_fraction, self.geometry_radius, self.geometry_layers,
            self.activation, self.max_neighbors, dtype=self.dtype,
            name="geometry_encoder")(geom_in, b_pos, deterministic, nbrs)
        local = MLP(self.local_layers, None, self.activation, dtype=self.dtype,
                    name="points_encoder")(points, deterministic)
        geom = jnp.broadcast_to(geom, (*local.shape[:-1], geom.shape[-1]))

        operator_in = jnp.concatenate([local, geom], axis=-1)
        par = Branch(self.branch_layers, self.activation, dtype=self.dtype,
                     name="branch")(param_features, deterministic)
        n_feat = self.geometry_layers[-1][-1] + self.local_layers[-1]
        y = NeuralOperatorSequential(
            self.n_operators, n_feat, self.operator_dropout, self.activation,
            dtype=self.dtype, name="neural_ops")(operator_in, par, deterministic)
        return nn.Dense(self.out_features, dtype=self.dtype, name="reduction")(y)


class PiGanoPpFullModule(nn.Module):
    """PI-GANO++ full forward (pi_gano_pp_full.py:53-72): SetAbstraction
    encoder over all points + FP-NeuralOperator decoder."""
    out_features: int
    branch_layers: Sequence[int]
    enc_layers: Sequence[Sequence[int]]
    enc_radius: Sequence[float]
    enc_fraction: Sequence[float]
    dec_layers: Sequence[Sequence[int]]
    dec_k: Sequence[int]
    fp_dropout: Optional[Sequence[Any]]
    variable_boundaries: VariableBoundaries
    activation: Activation = nn.silu
    max_neighbors: int = 64
    k_chunks: int = 8  # bound SA neighborhood temporaries (2nd-order graphs)
    dtype: Any = None

    @nn.compact
    def __call__(self, points, batch: FoamData, deterministic: bool = True):
        param_features = gather_parameters(batch, self.variable_boundaries)
        par = Branch(self.branch_layers, self.activation, dtype=self.dtype,
                     name="branch")(param_features, deterministic)
        from porous_cfd_tpu.models.neighbors import (extract_fp_idx,
                                                     extract_sa_neighbors)
        nbrs = extract_sa_neighbors(batch.domain, len(self.enc_radius))
        fp_idx = extract_fp_idx(batch.domain, len(self.dec_k))
        sa_in = jnp.concatenate([batch["sdf"], batch["boundaryId"], points],
                                axis=-1)
        (x, pos), skips = SetAbstractionSeq(
            self.enc_fraction, self.enc_radius, self.enc_layers,
            return_skip=True, activation=self.activation,
            max_neighbors=self.max_neighbors, k_chunks=self.k_chunks,
            dtype=self.dtype,
            name="encoder")(sa_in, points, deterministic, nbrs)
        y, _ = FeaturePropagationNeuralOperatorSeq(
            self.dec_layers, self.dec_k, self.fp_dropout, self.activation,
            dtype=self.dtype, name="decoder")(par, x, pos, skips,
                                              deterministic, fp_idx)
        return y


def _neural_ops_prop_ctx(params_prefix, n_operators, dropout, act,
                         last_activation, v_loc, j, h, vb_loc, geom, par,
                         deterministic, rng, analytic):
    """Propagate (v, J, H) through a NeuralOperatorSequential parameter tree
    whose input is ``[points_embedding || geometry_embedding]``:
    Dense -> activation -> dropout -> elementwise modulation by the constant
    branch embedding (constant context: d(par)/dx = 0).

    Uses the same structural optimizations as ``analytic.decoder_prop``: the
    first operator's kernel is split so the constant geometry block runs once
    per case and the J/H rows skip its zero block; internal + boundary value
    rows share each layer's matmul; one dropout mask covers the merged rows
    (matching the exact path's single forward)."""
    n_int = v_loc.shape[-2]
    par_j = par[..., None, :]
    v = None
    for i in range(n_operators):
        p = params_prefix[f"operator_{i}"]["Dense_0"]
        if i == 0:
            v, j, h, v_b = analytic.context_dense_prop(
                p, v_loc.shape[-1], v_loc, j, h, vb_loc, geom)
            v = jnp.concatenate([v, v_b], axis=-2)
        else:
            w = p["kernel"]
            v = v @ w + p["bias"]
            j = j @ w
            h = h @ w
        if not (i == n_operators - 1 and not last_activation):
            v, j, h = analytic.activation_prop_merged(act, v, j, h, n_int)
        if dropout[i] > 0 and not deterministic:
            rng, sub = jax.random.split(rng)
            v, j, h = analytic.dropout_prop_merged(sub, dropout[i], v, j, h,
                                                   n_int)
        v = v * par
        j = j * par_j
        h = h * par_j
    return v, j, h


def _trunk_prop_dispatch(params, module, lv_fn, lv_b, geom, par, act,
                         deterministic, rng):
    """Points-encoder + NeuralOperator-trunk + reduction propagation:
    the fused Pallas kernel on TPU (ops/neural_op_pallas.py — every layer
    intermediate VMEM-resident, transposed J/H layout end to end), the XLA
    closed-form path elsewhere. ``lv_fn(transposed)`` computes the local
    chain in the requested derivative layout. Returns engine-convention
    (out, jac, lap) or None when the kernel doesn't cover the config."""
    from porous_cfd_tpu.ops import neural_op_pallas
    from porous_cfd_tpu.physics import analytic

    if not (neural_op_pallas.on_tpu() and neural_op_pallas.supported(act)):
        return None
    n_feat = geom.shape[-1] + module.local_layers[-1]
    if par.shape[-1] != n_feat:  # trunk width must equal the branch width
        return None
    lv, ljt, lht = lv_fn(transposed=True)
    return neural_op_pallas.neural_ops_prop(
        params["neural_ops"], module.n_operators, lv.shape[-1], lv, ljt, lht,
        lv_b, geom, par, act, module.operator_dropout, True,
        params["reduction"], deterministic=deterministic, rng=rng)


def pi_gano_apply_with_derivatives(module: PiGanoModule):
    """Analytic fast-path derivatives for PiGanoModule (physics/analytic.py):
    the geometry/branch embeddings are pooled context (the reference already
    stop-gradients the geometry coords, pi_gano.py:59), so only the points
    encoder + NeuralOperator trunk propagate (v, J, H)."""
    from porous_cfd_tpu.physics import analytic

    def fn(params, batch: FoamData, rng=None, deterministic: bool = True):
        internal_view, boundary_view = split_contiguous(batch)
        x_int = internal_view["C"]
        x_bnd = boundary_view["C"]
        pts_all = jnp.concatenate([x_int, x_bnd], axis=-2)
        act = module.activation

        # pooled context: geometry + branch embeddings (value-only). Their
        # inputs are pure functions of the DATA (the reference stop-gradients
        # the geometry coords and the branch context is constant in x), so
        # they are precomputed per dataset by _gano_inputs_precompute and
        # carried in the domain aux — the per-step FoamData label/subdomain
        # selects cost ~4.3 ms/step on TPU, 4x the actual encoder compute.
        from porous_cfd_tpu.models.pipn import _pointnet_global_dispatch
        geom_full = batch.domain.get("_gano_geom_in")
        if geom_full is None:
            geom_in = jnp.concatenate([batch["boundaryId"], batch["sdf"]],
                                      axis=-1)
            geom_full = jnp.concatenate([geom_in, pts_all], axis=-1)
        geom = _pointnet_global_dispatch(
            params["geometry_encoder"]["linear"], module.geometry_layers,
            geom_full, act)
        par_features = batch.domain.get("_gano_par")
        if par_features is None:
            par_features = gather_parameters(batch, module.variable_boundaries)
        par = _pointnet_global_dispatch(params["branch"]["linear"],
                                        module.branch_layers, par_features,
                                        act)

        def local_chain(transposed=False):
            if transposed:
                j0t, h0t = analytic.identity_jacobian_t(x_int)
                return analytic.mlp_prop_t(params["points_encoder"],
                                           module.local_layers, x_int, j0t,
                                           h0t, act)
            j0, h0 = analytic.identity_jacobian(x_int)
            return analytic.mlp_prop(params["points_encoder"],
                                     module.local_layers, x_int, j0, h0, act)

        lv_b = analytic.mlp_value(params["points_encoder"],
                                  module.local_layers, x_bnd, act)
        if not module.full:
            fused = _trunk_prop_dispatch(params, module, local_chain, lv_b,
                                         geom, par, act, deterministic, rng)
            if fused is not None:
                return fused
        lv, lj, lh = local_chain()

        if module.full:
            outs = []
            for k in range(module.out_features):
                vk, jk, hk = _neural_ops_prop_ctx(
                    params[f"neural_ops_{k}"], module.n_operators,
                    module.operator_dropout, act, False, lv, lj, lh, lv_b,
                    geom, par, deterministic, rng, analytic)
                outs.append((jnp.sum(vk, -1, keepdims=True),
                             jnp.sum(jk, -1, keepdims=True),
                             jnp.sum(hk, -1, keepdims=True)))
            out, j, h = analytic.concat_triples(outs)
        else:
            v, j, h = _neural_ops_prop_ctx(
                params["neural_ops"], module.n_operators,
                module.operator_dropout, act, True, lv, lj, lh, lv_b,
                geom, par, deterministic, rng, analytic)
            out, j, h = analytic.dense_prop(params["reduction"], v, j, h)

        return out, jnp.swapaxes(j, -1, -2), jnp.swapaxes(h, -1, -2)

    return fn


def pi_gano_pp_apply_with_derivatives(module: PiGanoPpModule):
    """Analytic fast path for PiGanoPpModule: the SetAbstraction geometry
    embedding is pooled from boundary points (stop-gradient in the reference,
    pi_gano_pp.py:71-72) and the branch features come from batch data, so this
    matches exact autodiff everywhere."""
    from porous_cfd_tpu.models.set_abstraction import GeometryEncoderPp
    from porous_cfd_tpu.physics import analytic

    geom_enc = GeometryEncoderPp(module.geometry_fraction,
                                 module.geometry_radius,
                                 module.geometry_layers, module.activation,
                                 module.max_neighbors, dtype=module.dtype)

    def fn(params, batch: FoamData, rng=None, deterministic: bool = True):
        internal_view, boundary_view = split_contiguous(batch)
        x_int = internal_view["C"]
        x_bnd = boundary_view["C"]
        act = module.activation

        geom_in = jnp.concatenate([x_bnd, boundary_view["boundaryId"]],
                                  axis=-1)
        from porous_cfd_tpu.models.neighbors import extract_sa_neighbors
        from porous_cfd_tpu.ops import sa_pallas
        nbrs = extract_sa_neighbors(batch.domain, len(module.geometry_radius))
        if sa_pallas.enabled(act, nbrs):
            geom = sa_pallas.sa_seq_fused(
                params["geometry_encoder"]["set_abstraction"],
                module.geometry_fraction, module.geometry_radius,
                module.geometry_layers, module.max_neighbors, act, geom_in,
                x_bnd, nbrs)
        else:
            geom = geom_enc.apply({"params": params["geometry_encoder"]},
                                  geom_in, x_bnd, deterministic, nbrs)
        from porous_cfd_tpu.models.pipn import _pointnet_global_dispatch
        par_features = gather_parameters(batch, module.variable_boundaries)
        par = _pointnet_global_dispatch(params["branch"]["linear"],
                                        module.branch_layers, par_features,
                                        act)

        def local_chain(transposed=False):
            if transposed:
                j0t, h0t = analytic.identity_jacobian_t(x_int)
                return analytic.mlp_prop_t(params["points_encoder"],
                                           module.local_layers, x_int, j0t,
                                           h0t, act)
            j0, h0 = analytic.identity_jacobian(x_int)
            return analytic.mlp_prop(params["points_encoder"],
                                     module.local_layers, x_int, j0, h0, act)

        lv_b = analytic.mlp_value(params["points_encoder"],
                                  module.local_layers, x_bnd, act)
        fused = _trunk_prop_dispatch(params, module, local_chain, lv_b, geom,
                                     par, act, deterministic, rng)
        if fused is not None:
            return fused
        lv, lj, lh = local_chain()

        v, j, h = _neural_ops_prop_ctx(
            params["neural_ops"], module.n_operators, module.operator_dropout,
            act, True, lv, lj, lh, lv_b, geom, par, deterministic, rng,
            analytic)
        out, j, h = analytic.dense_prop(params["reduction"], v, j, h)
        return out, jnp.swapaxes(j, -1, -2), jnp.swapaxes(h, -1, -2)

    return fn


def _gano_inputs_precompute(variable_boundaries: VariableBoundaries):
    """Dataset-level aux for the plain PI-GANO analytic path: the geometry
    encoder input [boundaryId || sdf || C] and the branch input
    (gather_parameters) are pure functions of the data, so build them ONCE
    per (re)sampled dataset instead of re-selecting label columns inside
    every jitted step (measured 4.3 ms/step of TPU select/concat work)."""

    def precompute(dataset: FoamData):
        internal_view, boundary_view = split_contiguous(dataset)
        pts_all = jnp.concatenate([internal_view["C"], boundary_view["C"]],
                                  axis=-2)
        geom_in = jnp.concatenate(
            [dataset["boundaryId"], dataset["sdf"], pts_all], axis=-1)
        return {"_gano_geom_in": geom_in,
                "_gano_par": gather_parameters(dataset, variable_boundaries)}

    return precompute


def _pi_gano_model(module, dims, nu, scalers,
                   derivative_apply=None, neighbor_precompute=None) -> PinnModel:
    u_s, p_s, c_s = scalers["U"], scalers["p"], scalers["C"]
    d_s, f_s = scalers["d"], scalers["f"]
    return PinnModel(
        module=module, dims=dims,
        momentum_loss=MomentumLossVariable(nu, u_s, c_s, p_s, d_s, f_s),
        continuity_loss=ContinuityLossStandardized(u_s, c_s),
        enable_data_loss=True, u_scaler=u_s, p_scaler=p_s,
        learning_rate=1e-3, lr_gamma=0.999,
        derivative_apply=derivative_apply,
        neighbor_precompute=neighbor_precompute)


def pi_gano(nu: float, out_features: int, branch_layers, geometry_layers,
            local_layers, n_operators, operator_dropout, scalers: dict,
            variable_boundaries: VariableBoundaries,
            activation: Activation = nn.silu, full: bool = False,
            dtype: Any = None, fast_derivatives: bool = False) -> PinnModel:
    """PI-GANO / PI-GANO-full (pi_gano.py)."""
    module = PiGanoModule(out_features, branch_layers, geometry_layers,
                          local_layers, n_operators, operator_dropout,
                          variable_boundaries, activation, full, dtype=dtype)
    return _pi_gano_model(module, out_features - 1, nu, scalers,
                          pi_gano_apply_with_derivatives(module)
                          if fast_derivatives else None,
                          _gano_inputs_precompute(variable_boundaries)
                          if fast_derivatives else None)


def pi_gano_pp(nu: float, out_features: int, branch_layers, geometry_layers,
               geometry_radius, geometry_fraction, local_layers, n_operators,
               operator_dropout, scalers: dict,
               variable_boundaries: VariableBoundaries,
               activation: Activation = nn.silu, max_neighbors: int = 64,
               dtype: Any = None, fast_derivatives: bool = True) -> PinnModel:
    """PI-GANO++ (pi_gano_pp.py). The analytic fast path is exact for this
    family (pooled context from boundary points only) and on by default."""
    module = PiGanoPpModule(out_features, branch_layers, geometry_layers,
                            geometry_radius, geometry_fraction, local_layers,
                            n_operators, operator_dropout, variable_boundaries,
                            activation, max_neighbors, dtype=dtype)
    from porous_cfd_tpu.models.pipn import _boundary_sa_precompute
    return _pi_gano_model(module, out_features - 1, nu, scalers,
                          pi_gano_pp_apply_with_derivatives(module)
                          if fast_derivatives else None,
                          _boundary_sa_precompute(geometry_fraction,
                                                  geometry_radius,
                                                  max_neighbors,
                                                  feats_order="C_first"))


def pi_gano_pp_full(nu: float, out_features: int, branch_layers, enc_layers,
                    enc_radius, enc_fraction, dec_layers, dec_k, fp_dropout,
                    scalers: dict, variable_boundaries: VariableBoundaries,
                    activation: Activation = nn.silu, max_neighbors: int = 64,
                    dtype: Any = None,
                    fast_derivatives: bool = True) -> PinnModel:
    """PI-GANO++ full (pi_gano_pp_full.py). NOTE: the reference's decoder
    emits dec_layers[-1][-1] channels (4 in its example config = D+1+1); the
    PinnModel output schema uses out_features channels [U.., p], so configs
    should set dec_layers[-1][-1] == out_features. Default derivative path:
    decoupled-hierarchy analytic (models/fp_analytic.py);
    ``fast_derivatives=False`` restores exact reference-autograd replay."""
    module = PiGanoPpFullModule(out_features, branch_layers, enc_layers,
                                enc_radius, enc_fraction, dec_layers, dec_k,
                                fp_dropout, variable_boundaries, activation,
                                max_neighbors, dtype=dtype)
    derivative_apply = None
    if fast_derivatives:
        from porous_cfd_tpu.models.fp_analytic import \
            pi_gano_pp_full_apply_with_derivatives
        derivative_apply = pi_gano_pp_full_apply_with_derivatives(module)
    from porous_cfd_tpu.models.pipn import _all_points_unet_precompute
    model = _pi_gano_model(module, out_features - 1, nu, scalers,
                           derivative_apply=derivative_apply,
                           neighbor_precompute=_all_points_unet_precompute(
                               enc_fraction, enc_radius, max_neighbors, dec_k,
                               len(enc_layers) > len(enc_radius)))
    if derivative_apply is not None:
        return model
    import dataclasses as _dc
    return _dc.replace(model, remat=True, microbatch=2)
