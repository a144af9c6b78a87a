"""Core dense building blocks (flax.linen).

Counterparts of the reference torch modules (``models/modules.py:23-98``):
``MLP`` (Linear stack with per-layer dropout and optional plain last layer),
``PointNetFeatureExtract`` (PIPN encoder: shared local MLP on coordinates +
global MLP on [local || features] + symmetric max-pool over points),
``Branch``/``GeometryEncoder``/``NeuralOperator`` stacks for PI-GANO.

All matmuls run through ``nn.Dense`` with a configurable compute ``dtype``
(bfloat16 on TPU for the MXU); parameters stay float32.
"""
from __future__ import annotations

from typing import Any, Callable, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

Activation = Callable[[jnp.ndarray], jnp.ndarray]


class MLP(nn.Module):
    """Linear stack. ``layers`` includes the input size (reference signature,
    modules.py:30-53): layers [in, h1, ..., out]. ``dropout`` has one entry per
    Linear layer. ``last_activation=False`` leaves the final layer plain."""
    layers: Sequence[int]
    dropout: Optional[Sequence[float]] = None
    activation: Activation = nn.tanh
    last_activation: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        n_out = len(self.layers) - 1
        if self.dropout is not None and len(self.dropout) != n_out:
            raise ValueError(
                f"Mismatching number of layers ({len(self.layers)}) and dropout "
                f"({len(self.dropout)}).")
        for i in range(n_out):
            x = nn.Dense(self.layers[i + 1], dtype=self.dtype, name=f"linear_{i}")(x)
            if i < n_out - 1 or self.last_activation:
                x = self.activation(x)
            if self.dropout is not None and self.dropout[i] > 0:
                x = nn.Dropout(self.dropout[i], deterministic=deterministic)(x)
        return x


class PointNetFeatureExtract(nn.Module):
    """PIPN encoder (modules.py:56-82): local shared MLP on coordinates, global
    MLP on [local || features] followed by max-pool over the point axis."""
    local_layers: Sequence[int]
    global_layers: Sequence[int]
    activation: Activation = nn.tanh
    dtype: Any = None

    @nn.compact
    def __call__(self, x, pos, deterministic: bool = True):
        local = MLP(self.local_layers, activation=self.activation,
                    dtype=self.dtype, name="local_feature")(pos)
        g_in = jnp.concatenate([local, x], axis=-1)
        g = MLP(self.global_layers, activation=self.activation,
                dtype=self.dtype, name="global_feature")(g_in)
        g = jnp.max(g, axis=-2, keepdims=True)
        return local, g


class Branch(nn.Module):
    """PI-GANO branch net (modules.py:171-190): MLP + max-pool -> (B,1,H)."""
    hidden_channels: Sequence[int]
    activation: Activation = nn.silu
    dtype: Any = None

    @nn.compact
    def __call__(self, param_features, deterministic: bool = True):
        y = MLP(self.hidden_channels, activation=self.activation,
                dtype=self.dtype, name="linear")(param_features)
        return jnp.max(y, axis=-2, keepdims=True)


class GeometryEncoder(nn.Module):
    """PI-GANO geometry encoder (modules.py:193-214): MLP on [features || pos]
    + max-pool -> (B,1,K)."""
    hidden_channels: Sequence[int]
    activation: Activation = nn.silu
    dtype: Any = None

    @nn.compact
    def __call__(self, x, pos, deterministic: bool = True):
        y = MLP(self.hidden_channels, activation=self.activation,
                dtype=self.dtype, name="linear")(jnp.concatenate([x, pos], axis=-1))
        return jnp.max(y, axis=-2, keepdims=True)


class NeuralOperator(nn.Module):
    """One PI-GANO trunk layer (modules.py:217-245): Dense -> activation ->
    dropout, output modulated by the branch embedding."""
    out_channels: int
    dropout: float = 0.0
    activation: Optional[Activation] = nn.silu
    dtype: Any = None

    @nn.compact
    def __call__(self, x, par_embedding, deterministic: bool = True):
        y = nn.Dense(self.out_channels, dtype=self.dtype)(x)
        if self.activation is not None:
            y = self.activation(y)
        if self.dropout > 0:
            y = nn.Dropout(self.dropout, deterministic=deterministic)(y)
        return y * par_embedding


class NeuralOperatorSequential(nn.Module):
    """Stack of NeuralOperator layers with per-layer dropout
    (modules.py:248-274)."""
    n_operators: int
    n_features: int
    dropout: Sequence[float]
    activation: Activation = nn.silu
    last_activation: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x, par_embedding, deterministic: bool = True):
        for i in range(self.n_operators):
            act = None if (i == self.n_operators - 1 and not self.last_activation) \
                else self.activation
            x = NeuralOperator(self.n_features, self.dropout[i], act,
                               dtype=self.dtype, name=f"operator_{i}")(
                x, par_embedding, deterministic)
        return x
