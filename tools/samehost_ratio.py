"""Same-hardware framework-efficiency ratio: the reference-shaped torch
training step vs this framework's step on the SAME host CPU.

The ``vs_baseline`` multiplier in bench.py divides a measured TPU number by
an unverifiable GPU *estimate* (no GPU exists in this environment). This
tool removes the hardware variable entirely: both frameworks run the same
mathematical step (duct_fixed_boundary envelope — batch 13, 1500/1000/700
points, PIPN topology, second-order physics residuals, composite loss,
Adam) on the identical CPU, giving a measured framework-to-framework ratio
with no estimated quantity anywhere. Torch runs the reference's exact
formulation (7 sequential create_graph autograd replays,
tools/torch_baseline.py); the JAX side is measured twice — the
reference-semantics exact-autodiff path (apples-to-apples formulation) and
the product-default analytic path (what a user actually gets).

Run on a QUIET machine: python tools/samehost_ratio.py [--torch-steps 2]
Prints one JSON line.
"""
import argparse
import json
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def measure_jax_cpu(exact: bool, steps: int) -> float:
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from bench import BATCH, N_BOUNDARY, N_CASES, N_INTERNAL, N_OBS, make_model
    from porous_cfd_tpu.data.synthetic import make_foam_batch
    from porous_cfd_tpu.train.engine import (gather_cases, make_optimizer,
                                             make_train_functions)

    rng = np.random.default_rng(8421)
    dataset = make_foam_batch(N_CASES, N_INTERNAL, N_BOUNDARY, N_OBS, rng=rng)
    model, scaler = make_model("pipn_exact" if exact else "pipn")
    dataset = jax.device_put(model.attach_neighbors(dataset))
    tx = make_optimizer(model, N_CASES // BATCH)
    fns = make_train_functions(model, tx, loss_scaler=scaler)
    state = fns.init_state(gather_cases(dataset, jnp.arange(BATCH)))
    batch = gather_cases(dataset, jnp.arange(BATCH))
    state, m = fns.train_step(state, batch)      # compile + warmup
    np.asarray(m)
    t0 = time.perf_counter()
    for _ in range(steps):
        state, m = fns.train_step(state, batch)
    np.asarray(m)
    return steps / (time.perf_counter() - t0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--torch-steps", type=int, default=2)
    ap.add_argument("--jax-steps", type=int, default=20)
    ap.add_argument("--jax-exact-steps", type=int, default=5)
    args = ap.parse_args()

    # torch in a subprocess (isolates thread pools / allocator state)
    p = subprocess.run([sys.executable, str(REPO / "tools/torch_baseline.py"),
                        "--steps", str(args.torch_steps)],
                       capture_output=True, text=True, cwd=REPO)
    line = next((l for l in reversed(p.stdout.splitlines())
                 if l.startswith("{")), None)
    torch_sps = json.loads(line)["steps_per_sec"] if line else None

    jax_exact = measure_jax_cpu(True, args.jax_exact_steps)
    jax_default = measure_jax_cpu(False, args.jax_steps)

    out = {
        "host": "same-CPU measured pair (no estimates)",
        "torch_reference_steps_per_sec": torch_sps,
        "jax_exact_autodiff_steps_per_sec": round(jax_exact, 4),
        "jax_default_steps_per_sec": round(jax_default, 4),
        "ratio_exact_formulation": (round(jax_exact / torch_sps, 1)
                                    if torch_sps else None),
        "ratio_default_path": (round(jax_default / torch_sps, 1)
                               if torch_sps else None),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
