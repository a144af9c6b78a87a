"""PinnModel: bundles a flax module with its physics losses and training recipe.

TPU-native counterpart of ``PorousPinnBase`` (``models/model_base.py:69-254``):
the torch LightningModule's responsibilities are split between this pure
container (schema + losses + optimizer hyperparameters) and the jit-compiled
step functions in ``porous_cfd_tpu.train.engine``.

Every model module follows one forward contract::

    y = module.apply({'params': params}, points, batch,
                     deterministic=..., rngs={'dropout': key})

where ``points (..., N, Din)`` is the differentiable coordinate tensor (the
reference's ``autograd_points``: internal followed by boundary points) and
``batch`` is the full ``FoamData``; ``y`` has output channels [Ux, Uy, (Uz), p].
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional

import flax.linen as nn

from porous_cfd_tpu.data.scalers import StandardScaler


def predicted_labels(dims: int) -> dict:
    """Output schema [Ux, Uy, (Uz), p] + composite U (model_base.py:130-139)."""
    u_labels = ["Ux", "Uy", "Uz"][:dims]
    labels: dict = dict.fromkeys(u_labels, None)
    labels["p"] = None
    labels["U"] = u_labels
    return labels


def extra_labels(dims: int) -> dict:
    """Residual output schema (model_base.py:141-149)."""
    m_labels = ["Momentumx", "Momentumy", "Momentumz"][:dims]
    labels: dict = dict.fromkeys(m_labels, None)
    labels["div"] = None
    labels["Momentum"] = m_labels
    return labels


def loss_labels(dims: int, enable_data_loss: bool) -> list[str]:
    """Ordered TensorBoard labels matching the loss-vector layout
    [continuity, momentum_x.., boundary_ux.., boundary_p, obs_ux.., obs_p].

    Note: the reference declares boundary/observation label order p-first while
    logging values u-first (model_base.py:101-104 vs :207), swapping two curves;
    here labels follow the actual value order.
    """
    axes = ["x", "y", "z"][:dims]
    labels = ["Continuity loss"] + [f"Momentum {a} loss" for a in axes]
    labels += [f"Boundary loss u{a}" for a in axes] + ["Boundary loss p"]
    if enable_data_loss:
        labels += [f"Observations loss u{a}" for a in axes] + ["Observations loss p"]
    return labels


def error_labels(dims: int) -> list[str]:
    return ["error p"] + [f"error u{a}" for a in ["x", "y", "z"][:dims]]


@dataclasses.dataclass(frozen=True)
class PinnModel:
    """A model family member: module + losses + optimizer recipe.

    :param module: flax module with the forward contract above.
    :param dims: spatial dimensionality D (out_features = D + 1).
    :param momentum_loss: callable (internal, u, u_jac, u_lap, p_grad) -> (D,).
    :param continuity_loss: callable (u_jac,) -> scalar.
    :param enable_data_loss: include observation losses (model_base.py:80-88).
    :param u_scaler/p_scaler: output denormalizers applied before error metrics
        (``postprocess_out``, pipn_foam.py:55-56); None for raw models.
    :param learning_rate/lr_gamma/adam_eps: optimizer recipe (Adam +
        per-epoch ExponentialLR in every reference model).
    :param derivative_apply: optional fused fast path
        ``(params, batch, rng, deterministic) -> (out_full, jac, lap)``
        computing the forward + per-point spatial derivatives analytically
        (physics/analytic.py); when None the engine uses the exact
        autodiff operator (physics/operators.py).
    """
    module: nn.Module
    dims: int
    momentum_loss: Any
    continuity_loss: Any
    enable_data_loss: bool = True
    u_scaler: Optional[StandardScaler] = None
    p_scaler: Optional[StandardScaler] = None
    learning_rate: float = 1e-3
    lr_gamma: float = 0.999
    adam_eps: float = 1e-8
    derivative_apply: Optional[Any] = None
    neighbor_precompute: Optional[Any] = None  # FoamData -> domain-aux dict
    remat: bool = False  # checkpoint the forward inside the second-order graph
    # (required for the U-Net variants at reference point counts: their
    # (B, C, K, F) neighborhood tensors x 2nd-order tangents exceed HBM)
    microbatch: Optional[int] = None  # gradient-accumulation micro-batch rows:
    # bound the live second-order graph to `microbatch` cases at a time (the
    # torch reference's sequential autograd replays have the same effect)
    eval_dtype: Optional[Any] = None  # compute dtype for FORWARD-ONLY paths
    # (validation / non-verbose inference); training + derivative graphs stay
    # f32 — axon miscompiles the fused second-order bf16 graph (BASELINE.md)

    def with_precision(self, precision: str) -> "PinnModel":
        """Honor the Lightning-style ``--precision`` flag
        (common/training.py:30-31) on the safe surfaces: ``bf16*`` makes the
        forward-only eval/inference matmuls run in bfloat16 compute with f32
        params; anything else is full f32. Derivative graphs are always f32."""
        import jax.numpy as jnp

        dtype = jnp.bfloat16 if str(precision).startswith("bf16") else None
        return dataclasses.replace(self, eval_dtype=dtype)

    @property
    def eval_module(self) -> nn.Module:
        """The forward module with ``eval_dtype`` compute precision applied
        (all module classes thread ``dtype`` down their Dense stacks)."""
        if self.eval_dtype is None:
            return self.module
        return self.module.clone(dtype=self.eval_dtype)

    def attach_neighbors(self, dataset):
        """Merge precomputed neighbor structures (FPS centroids / radius
        graphs — static per case) into the dataset's domain. No-op when the
        model has no neighbor chain."""
        if self.neighbor_precompute is None:
            return dataset
        from porous_cfd_tpu.data.foam_data import FoamData
        aux = self.neighbor_precompute(dataset)
        return FoamData(dataset.data, dataset.labels,
                        {**dataset.domain, **aux})

    @property
    def out_features(self) -> int:
        return self.dims + 1

    @property
    def predicted_labels(self) -> dict:
        return predicted_labels(self.dims)

    @property
    def extra_labels(self) -> dict:
        return extra_labels(self.dims)

    @property
    def num_losses(self) -> int:
        return 1 + self.dims + (self.dims + 1) * (2 if self.enable_data_loss else 1)

    def postprocess_out(self, u, p):
        """Denormalize outputs before error metrics (model_base.py:151-159)."""
        if self.u_scaler is not None:
            u = self.u_scaler.inverse_transform(u)
        if self.p_scaler is not None:
            p = self.p_scaler.inverse_transform(p)
        return u, p
