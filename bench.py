"""Benchmark harness: train steps/sec/chip on the duct_fixed_boundary-class
PIPN workload (the reference's headline training envelope:
batch 13, 1500/1000/700 internal/boundary/observation points, 2D,
common/training.py:29-32 + README.md:35).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Timing notes:
  * the dataset is device-resident; every epoch is one lax.scan execution;
  * synchronization is via a device->host transfer of the final metrics
    (``np.asarray``), NOT ``block_until_ready`` — on the axon-tunneled TPU
    backend block_until_ready returns before execution completes, which
    silently turns a throughput benchmark into a dispatch-rate benchmark.

Baseline: the reference is a single-GPU PyTorch Lightning loop with no
published numbers (BASELINE.md). We use a reference-favorable estimate of
30 steps/s for its training step on a modern datacenter GPU (1 + D + D^2 = 7
sequential autograd graph replays + Lightning dispatch; the host-measured
torch-CPU data point is 0.005 steps/s). vs_baseline = value / 30.
"""
import json
import time

import numpy as np

REFERENCE_GPU_STEPS_PER_SEC = 30.0  # favorable estimate, see BASELINE.md

BATCH = 13
N_INTERNAL, N_BOUNDARY, N_OBS = 1500, 1000, 700
N_CASES = 52  # 4 steps/epoch
EPOCHS_TIMED = 10


def main():
    import jax
    import jax.numpy as jnp

    from porous_cfd_tpu.data.foam_data import FoamData
    from porous_cfd_tpu.data.synthetic import make_foam_batch, make_scalers
    from porous_cfd_tpu.models.pipn import pipn_foam
    from porous_cfd_tpu.physics.scaling import FixedLossScaler
    from porous_cfd_tpu.train.engine import make_optimizer, make_train_functions

    rng = np.random.default_rng(8421)
    dataset = jax.device_put(
        make_foam_batch(N_CASES, N_INTERNAL, N_BOUNDARY, N_OBS, rng=rng))

    # duct_fixed_boundary 'pipn' config (examples/duct_fixed_boundary/train.py:27-37)
    model = pipn_foam(
        nu=1489.4e-6, d=14000.0, f=17.11,
        fe_local_layers=[2, 64, 64],
        fe_global_layers=[64 + 1 + 4, 96, 128, 1024],
        seg_layers=[1024 + 64, 512, 256, 128, 3],
        seg_dropout=[0.05, 0.05, 0, 0],
        scalers=make_scalers(),
        fast_derivatives=True)  # analytic J/H propagation (physics/analytic.py)
    scaler = FixedLossScaler.from_dict(
        {"continuity": [1], "momentum": [1] * 2, "boundary": [1] * 3,
         "observations": [100] * 3})

    steps_per_epoch = N_CASES // BATCH
    tx = make_optimizer(model, steps_per_epoch)
    fns = make_train_functions(model, tx, loss_scaler=scaler)
    state = fns.init_state(FoamData(
        dataset.data[:BATCH], dataset.labels,
        {k: v[:BATCH] for k, v in dataset.domain.items()}))

    host_rng = np.random.default_rng(0)

    def epoch(state):
        perm = host_rng.permutation(N_CASES)[:steps_per_epoch * BATCH]
        perm = jnp.asarray(perm.reshape(steps_per_epoch, BATCH))
        return fns.train_epoch(state, dataset, perm)

    # warmup / compile, synced by pulling the metrics to host
    state, m = epoch(state)
    m_host = np.asarray(m)

    t0 = time.perf_counter()
    for _ in range(EPOCHS_TIMED):
        state, m = epoch(state)
    m_host = np.asarray(m)  # device->host transfer = reliable sync
    dt = time.perf_counter() - t0

    steps_per_sec = EPOCHS_TIMED * steps_per_epoch / dt
    assert np.isfinite(m_host[0]), "non-finite training loss in benchmark"
    print(json.dumps({
        "metric": "train_steps_per_sec_per_chip (2D duct PIPN, batch 13, 2500 pts)",
        "value": round(steps_per_sec, 2),
        "unit": "steps/s",
        "vs_baseline": round(steps_per_sec / REFERENCE_GPU_STEPS_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
