"""Honest perf accounting for the training step at the bench envelope.

Measures, on the real device, with transfer-synced timing (utils/profiling):
  1. matmul peak at representative shapes (default / highest precision);
  2. value-only forward, (v,J,H) derivative forward, full grad+Adam step;
  3. XLA's own FLOP estimate for each compiled program
     (``compiled.cost_analysis()``), giving an achieved-FLOPs/s and an MFU
     figure against the measured matmul peak — published in BASELINE.md.

Usage: python tools/profile_step.py [--family pipn|pipn_pp|pi_gano|exact]
"""
import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def measured_matmul_peak(jnp, jax, m=8192, k=2048, n=2048, dtype="float32"):
    """Sustained dot throughput at an MXU-friendly shape."""
    from porous_cfd_tpu.utils import profiling
    a = jnp.ones((m, k), dtype)
    b = jnp.ones((k, n), dtype)
    f = jax.jit(lambda a, b: a @ b)
    dt, _ = profiling.timed(f, a, b, n=20, warmup=3)
    return 2 * m * k * n / dt


def flops_of(compiled):
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0] if ca else {}
    return float((ca or {}).get("flops", float("nan")))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--family", default="pipn",
                    choices=["pipn", "pipn_exact", "pipn_pp", "pi_gano"])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from porous_cfd_tpu.data.foam_data import FoamData
    from porous_cfd_tpu.data.synthetic import make_foam_batch, make_scalers
    from porous_cfd_tpu.physics.scaling import FixedLossScaler
    from porous_cfd_tpu.train.engine import (gather_cases, make_optimizer,
                                             make_train_functions)
    from porous_cfd_tpu.utils import profiling
    from bench import make_model, BATCH, N_INTERNAL, N_BOUNDARY, N_OBS, N_CASES

    rng = np.random.default_rng(8421)
    dataset = jax.device_put(make_foam_batch(
        N_CASES, N_INTERNAL, N_BOUNDARY, N_OBS, rng=rng))
    model, scaler = make_model(args.family)
    dataset = jax.device_put(model.attach_neighbors(dataset))

    batch = gather_cases(dataset, jnp.arange(BATCH))
    tx = make_optimizer(model, N_CASES // BATCH)
    fns = make_train_functions(model, tx, loss_scaler=scaler)
    state = fns.init_state(batch)

    report = {"device": str(jax.devices()[0]),
              "family": args.family}

    peak_default = measured_matmul_peak(jnp, jax)
    report["matmul_peak_default_tflops"] = round(peak_default / 1e12, 1)

    # value-only forward (eval path)
    fwd = jax.jit(lambda p, b: fns.eval_batch(p, b))
    dt_f, _ = profiling.timed(fwd, state.params, batch, n=20, warmup=2)
    report["forward_eval_ms"] = round(dt_f * 1e3, 2)

    # full train step (train_step donates its state: thread it through)
    rate, state = profiling.steps_per_sec(fns.train_step, state, batch,
                                          n_steps=20)
    dt_s = 1 / rate
    report["train_step_ms"] = round(dt_s * 1e3, 2)
    report["train_steps_per_sec"] = round(rate, 1)

    # XLA FLOP estimate of the whole step -> achieved FLOPs + MFU
    try:
        compiled = jax.jit(lambda s, b: fns.train_step(s, b)).lower(
            state, batch).compile()
        flops = flops_of(compiled)
        report["xla_step_flops_g"] = round(flops / 1e9, 1)
        report["achieved_tflops"] = round(flops / dt_s / 1e12, 1)
        report["mfu_vs_measured_peak_pct"] = round(
            100 * flops / dt_s / peak_default, 1)
    except Exception as e:  # cost_analysis is backend-dependent
        report["cost_analysis_error"] = str(e)

    print(json.dumps(report))


if __name__ == "__main__":
    main()
