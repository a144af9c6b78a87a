"""FoamData: an immutable pytree wrapping a point-cloud tensor with label- and
subdomain-based indexing.

TPU-native counterpart of the reference container (``dataset/foam_data.py:5-90``):
the data tensor has static shape ``(..., N, D)``; labels are *static* metadata
(part of the pytree treedef, so jit re-traces only when the schema changes) and
subdomains are integer index arrays (leaves) gathered with ``take_along_axis``.

Schema rules (mirroring the reference):
  * single labels (value ``None``) occupy one column each, in insertion order;
  * composite labels (value = tuple of single-label names) concatenate their
    sub-label columns on lookup;
  * subdomain lookup gathers rows and returns a new ``FoamData`` whose only
    subdomain is the looked-up one re-indexed from zero.
"""
from __future__ import annotations

import dataclasses
from typing import Mapping, Sequence

import jax
import jax.numpy as jnp
import numpy as np

Labels = tuple[tuple[str, tuple[str, ...] | None], ...]


def freeze_labels(labels: Mapping[str, Sequence[str] | None]) -> Labels:
    """Canonicalize a labels mapping into a hashable tuple-of-pairs."""
    if isinstance(labels, tuple):
        return labels
    return tuple((k, tuple(v) if v is not None else None) for k, v in labels.items())


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class FoamData:
    """Wrapper around an array supporting indexing by field name and subdomain.

    :param data: array of shape ``(N, D)`` or ``(B, N, D)``.
    :param labels: mapping label -> None (single) or list of sub-labels (composite).
        Single labels must precede composite labels (their position defines the column).
    :param domain: mapping subdomain name -> integer index array ``(K,)`` or ``(B, K)``.
    """

    data: jnp.ndarray
    labels: Labels
    domain: dict[str, jnp.ndarray]

    def __init__(self, data, labels, domain):
        object.__setattr__(self, "data", data)
        object.__setattr__(self, "labels", freeze_labels(labels))
        object.__setattr__(self, "domain", dict(domain))

    # -- pytree protocol -------------------------------------------------
    def tree_flatten(self):
        keys = tuple(self.domain.keys())
        return (self.data, tuple(self.domain[k] for k in keys)), (self.labels, keys)

    @classmethod
    def tree_unflatten(cls, aux, children):
        labels, keys = aux
        data, dom_vals = children
        return cls(data, labels, dict(zip(keys, dom_vals)))

    # -- schema helpers --------------------------------------------------
    @property
    def label_dict(self) -> dict[str, tuple[str, ...] | None]:
        return dict(self.labels)

    @property
    def columns(self) -> tuple[str, ...]:
        """Ordered single-label column names."""
        return tuple(k for k, v in self.labels if v is None)

    def column_index(self, name: str) -> int:
        # Reference semantics: column = position in the labels dict
        # (dataset/foam_data.py:45-46); single labels precede composites so this
        # equals the position among single labels.
        for i, (k, _) in enumerate(self.labels):
            if k == name:
                return i
        raise KeyError(name)

    def column_indices(self, name: str) -> list[int]:
        lab = self.label_dict
        if name not in lab:
            raise KeyError(name)
        sub = lab[name]
        if sub is None:
            return [self.column_index(name)]
        out: list[int] = []
        for s in sub:
            out.extend(self.column_indices(s))
        return out

    # -- indexing ---------------------------------------------------------
    def __getitem__(self, item: str) -> "FoamData | jnp.ndarray":
        lab = self.label_dict
        if item in lab:
            cols = self.column_indices(item)
            # contiguous ranges lower to a slice under XLA
            if cols == list(range(cols[0], cols[0] + len(cols))):
                return self.data[..., cols[0]:cols[0] + len(cols)]
            return jnp.take(self.data, jnp.asarray(cols), axis=-1)
        if item in self.domain:
            ids = self.domain[item]
            if self.data.ndim > 2:
                gather = jnp.broadcast_to(
                    ids[..., None], (*ids.shape, self.data.shape[-1]))
                sub = jnp.take_along_axis(self.data, gather, axis=-2)
            else:
                sub = self.data[ids]
            new_ids = jnp.arange(ids.shape[-1])
            if ids.ndim > 1:
                new_ids = jnp.broadcast_to(new_ids, ids.shape)
            return FoamData(sub, self.labels, {item: new_ids})
        raise KeyError(
            f"{item} not found in labels or subdomains. "
            f"Available labels: {list(lab.keys())}. "
            f"Available subdomains: {list(self.domain.keys())}.")

    def __contains__(self, item: str) -> bool:
        return item in self.label_dict or item in self.domain

    # -- utilities ----------------------------------------------------------
    def squeeze(self) -> "FoamData":
        data = jnp.squeeze(self.data, axis=0) if self.data.ndim > 2 else self.data
        dom = {k: (jnp.squeeze(v, axis=0) if v.ndim > 1 else v)
               for k, v in self.domain.items()}
        return FoamData(data, self.labels, dom)

    def replace_data(self, data) -> "FoamData":
        return FoamData(data, self.labels, self.domain)

    def numpy(self) -> "FoamData":
        return FoamData(np.asarray(self.data), self.labels,
                        {k: np.asarray(v) for k, v in self.domain.items()})

    @property
    def n_points(self) -> int:
        return self.data.shape[-2]

    def __len__(self) -> int:
        return self.data.shape[0]


def split_contiguous(batch: FoamData) -> tuple[FoamData, FoamData]:
    """(internal, boundary) row views via STATIC slices.

    The dataset layout guarantees internal rows [0, Ni) followed by boundary
    rows [Ni, N) (dataset.py load_case; reference foam_dataset.py:429), so hot
    loops can slice instead of gather — take_along_axis lowers to slow
    gather/scatter pairs on TPU.
    """
    n_int = batch.domain["internal"].shape[-1]
    internal = FoamData(batch.data[..., :n_int, :], batch.labels,
                        {"internal": jnp.arange(n_int)})
    boundary = FoamData(batch.data[..., n_int:, :], batch.labels,
                        {"boundary": jnp.arange(batch.data.shape[-2] - n_int)})
    return internal, boundary


def collate(samples: Sequence[FoamData]) -> FoamData:
    """Stack per-case FoamData into a batch (reference ``collate_fn``,
    dataset/foam_dataset.py:83-90). All cases must share schema and shapes."""
    data = jnp.stack([s.data for s in samples])
    keys = samples[0].domain.keys()
    dom = {k: jnp.stack([s.domain[k] for s in samples]) for k in keys}
    return FoamData(data, samples[0].labels, dom)
