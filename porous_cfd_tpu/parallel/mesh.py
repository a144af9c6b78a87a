"""Device-mesh and multi-host helpers — the framework's distributed backend.

The reference has no framework-level distributed execution (single-GPU
Lightning, SURVEY.md section 5.8); its only multi-process communication is
OpenFOAM's own MPI inside datagen. The TPU-native counterpart is first-class:

  * a ``jax.sharding.Mesh`` over ('data', 'points') — geometry batch over the
    'data' axis (pure DP: gradient psum over ICI inserted by XLA), optional
    point-axis sharding for large 3D clouds (the honest analog of sequence/
    context parallelism for this workload: the global max-pool lowers to an
    all-reduce over the 'points' axis);
  * ``jax.distributed.initialize`` for multi-host pods (DCN coordination),
    with host-local batch construction via
    ``jax.make_array_from_process_local_data``.

``shard_batch`` in train/engine.py consumes these meshes; XLA inserts all
collectives — no hand-written NCCL/MPI analog exists or is needed.
"""
from __future__ import annotations

from typing import Optional, Sequence

import numpy as np


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """Initialize the JAX distributed runtime for multi-host execution.
    No-ops cleanly on a single host with no coordinator configured."""
    import jax

    if coordinator_address is None and num_processes in (None, 1):
        return
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def make_mesh(data: Optional[int] = None, points: int = 1,
              devices: Optional[Sequence] = None):
    """Build a ('data', 'points') mesh over the available devices.

    :param data: size of the data axis; defaults to n_devices // points.
    :param points: size of the point-sharding axis (1 = pure DP).
    """
    import jax
    from jax.sharding import Mesh

    devs = np.array(devices if devices is not None else jax.devices())
    if data is None:
        data = len(devs) // points
    if data * points > len(devs):
        raise ValueError(
            f"mesh ({data} x {points}) needs {data * points} devices, "
            f"have {len(devs)}")
    return Mesh(devs[:data * points].reshape(data, points),
                ("data", "points"))


def shard_dataset_for_hosts(dataset, mesh):
    """Assemble a global device array from per-host local case shards
    (multi-host data loading: each host loads its slice of the case list and
    this stitches the global (C, N, D) arrays)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from porous_cfd_tpu.data.foam_data import FoamData

    data = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("data")), np.asarray(dataset.data))
    dom = {k: jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("data")), np.asarray(v))
        for k, v in dataset.domain.items()}
    return FoamData(data, dataset.labels, dom)
