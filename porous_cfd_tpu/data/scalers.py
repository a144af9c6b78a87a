"""Feature scalers as jax-compatible pytrees.

Counterparts of the reference scalers (``dataset/foam_dataset.py:17-80``):
``StandardScaler`` (z-score) and ``Normalizer`` (min-max to [0,1]).
Implemented as frozen pytree dataclasses so they can be closed over or passed
through jit boundaries; broadcasting matches numpy semantics.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class StandardScaler:
    std: jnp.ndarray
    mean: jnp.ndarray

    def transform(self, data):
        return (data - self.mean) / self.std

    def inverse_transform(self, data):
        return self.std * data + self.mean

    def __getitem__(self, item):
        return StandardScaler(self.std[item], self.mean[item])

    def tree_flatten(self):
        return (self.std, self.mean), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    def astype(self, dtype):
        return StandardScaler(jnp.asarray(self.std, dtype), jnp.asarray(self.mean, dtype))


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class Normalizer:
    min: jnp.ndarray
    max: jnp.ndarray

    @property
    def range(self):
        return self.max - self.min

    def transform(self, data):
        return (data - self.min) / self.range

    def inverse_transform(self, data):
        return self.min + self.range * data

    def __getitem__(self, item):
        return Normalizer(self.min[item], self.max[item])

    def tree_flatten(self):
        return (self.min, self.max), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    def astype(self, dtype):
        return Normalizer(jnp.asarray(self.min, dtype), jnp.asarray(self.max, dtype))


def scalers_from_meta(meta: dict, normalize_fields: dict) -> dict:
    """Build scalers from ``meta.json`` statistics, mirroring the reference
    (dataset/foam_dataset.py:140-151)."""
    stats = meta["Stats"]
    out = {}
    for field in normalize_fields.get("Standardize", []):
        s = stats[field]
        out[field] = StandardScaler(np.asarray(s["Std"], np.float32),
                                    np.asarray(s["Mean"], np.float32))
    for field in normalize_fields.get("Scale", []):
        s = stats[field]
        out[field] = Normalizer(np.asarray(s["Min"], np.float32),
                                np.asarray(s["Max"], np.float32))
    return out
