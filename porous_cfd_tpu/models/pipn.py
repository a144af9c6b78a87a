"""PIPN model family (flax modules + PinnModel factories).

Counterparts of the reference models:
  * ``PipnManufactured``  (models/pipn/pipn_baseline.py:12-63) — physics-only,
    raw coordinates, Tanh, Adam(1e-3, eps=1e-6) + ExpLR(0.9995).
  * ``PipnFoam``          (models/pipn/pipn_foam.py:59-105) — data+physics with
    standardized features, SiLU, Adam(1e-3) + ExpLR(0.999).

Both share the PIPN topology: PointNet feature extraction (local shared MLP on
coordinates, global MLP + max-pool over [local || boundaryId || sdf]), global
embedding tiled per point, concatenated with local features, decoded by a
shared segmentation MLP.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from porous_cfd_tpu.data.foam_data import FoamData
from porous_cfd_tpu.models.base import PinnModel
from porous_cfd_tpu.models.mlp import MLP, Activation, PointNetFeatureExtract
from porous_cfd_tpu.physics.losses import (ContinuityLoss,
                                           ContinuityLossStandardized,
                                           MomentumLossFixed,
                                           MomentumLossManufactured)


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


def pipn_manufactured(nu: float, d: float, f: float,
                      fe_local_layers: Sequence[int],
                      fe_global_layers: Sequence[int],
                      seg_layers: Sequence[int],
                      activation: Activation = nn.tanh,
                      dtype: Any = None) -> PinnModel:
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
        learning_rate=1e-3, lr_gamma=0.9995, adam_eps=1e-6)


def pipn_foam(nu: float, d: float, f: float,
              fe_local_layers: Sequence[int],
              fe_global_layers: Sequence[int],
              seg_layers: Sequence[int],
              scalers: dict,
              seg_dropout: Optional[Sequence[float]] = None,
              activation: Activation = nn.silu,
              dtype: Any = None) -> PinnModel:
    """Data+physics PIPN with standardized features (pipn_foam.py:15-105)."""
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
        learning_rate=1e-3, lr_gamma=0.999)
