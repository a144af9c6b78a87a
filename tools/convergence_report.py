"""Wall-clock-to-accuracy report on the manufactured-solutions verification
workload: train the reference-sized PIPN for the reference's full envelope
(3000 epochs, seed 8421) on one TPU chip and report relative-L2 of U and p
against the ANALYTIC ground truth, plus wall-clock.

This instantiates the BASELINE.json north-star accuracy metric ("U,p rel-L2 <
5%") on the one experiment whose ground truth needs no OpenFOAM run.

Writes CONVERGENCE.md and prints a summary line.
"""
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def rel_l2(pred, ref):
    return float(np.linalg.norm(pred - ref) / np.linalg.norm(ref))


def main(epochs=3000, fast=True):
    import jax
    import jax.numpy as jnp

    from porous_cfd_tpu.data.manufactured import make_manufactured_batch
    from porous_cfd_tpu.models.pipn import pipn_manufactured
    from porous_cfd_tpu.train.engine import (gather_cases, make_optimizer,
                                             make_train_functions)

    NU, D, F = 0.01, 50.0, 1.0
    rng = np.random.default_rng(8421)
    n_cases, batch, n_int, n_bnd = 26, 13, 1000, 200
    ds = jax.device_put(make_manufactured_batch(rng, n_cases, n_int, n_bnd,
                                                NU, D, F))
    val = jax.device_put(make_manufactured_batch(rng, 4, n_int, n_bnd,
                                                 NU, D, F))

    # reference manufactured 'pipn' config (manufactured_solutions/train.py)
    model = pipn_manufactured(NU, D, F,
                              fe_local_layers=[2, 64, 64],
                              fe_global_layers=[64 + 3, 64, 128, 1024],
                              seg_layers=[1024 + 64, 512, 256, 128, 3],
                              fast_derivatives=fast)
    steps_per_epoch = n_cases // batch
    tx = make_optimizer(model, steps_per_epoch)
    fns = make_train_functions(model, tx)
    state = fns.init_state(gather_cases(ds, jnp.arange(batch)), seed=8421)

    host = np.random.default_rng(8421)
    t0 = time.time()
    for epoch in range(epochs):
        perm = host.permutation(n_cases)[:steps_per_epoch * batch]
        state, m = fns.train_epoch(state, ds,
                                   jnp.asarray(perm.reshape(steps_per_epoch,
                                                            batch)))
    final_metrics = np.asarray(m)
    wall = time.time() - t0

    vb = gather_cases(val, jnp.arange(4))
    pred = fns.predict_batch(state.params, vb, False).numpy()
    u_rel = rel_l2(np.asarray(pred["U"]), np.asarray(vb["U"]))
    p_rel = rel_l2(np.asarray(pred["p"]), np.asarray(vb["p"]))

    tb = gather_cases(ds, jnp.arange(4))
    pred_t = fns.predict_batch(state.params, tb, False).numpy()
    u_rel_t = rel_l2(np.asarray(pred_t["U"]), np.asarray(tb["U"]))
    p_rel_t = rel_l2(np.asarray(pred_t["p"]), np.asarray(tb["p"]))

    steps = epochs * steps_per_epoch
    summary = (f"{epochs} epochs ({steps} steps) in {wall:.0f}s "
               f"({steps / wall:.1f} steps/s) | final loss "
               f"{final_metrics[0]:.4f} | held-out rel-L2: U {u_rel:.3%}, "
               f"p {p_rel:.3%}")
    print(summary)

    Path("CONVERGENCE.md").write_text(f"""# Convergence report

Manufactured-solutions verification workload (analytic NS-Darcy ground truth,
no CFD required), reference training envelope: seed 8421, batch 13, 1000/200
internal/boundary points, 3000 epochs, reference PIPN architecture
(1024-wide global feature), Adam 1e-3 + ExpLR 0.9995, physics-only losses.

| Quantity | Value |
|---|---|
| Hardware | 1x TPU v5e (axon) |
| Derivative path | {'analytic (v,J,H) propagation' if fast else 'exact autodiff'} |
| Wall clock | {wall:.0f} s |
| Throughput | {steps / wall:.1f} steps/s |
| Final total loss | {final_metrics[0]:.5f} |
| Trained-geometry rel-L2 (U / p) | {u_rel_t:.3%} / {p_rel_t:.3%} |
| Held-out-geometry rel-L2 (U / p) | {u_rel:.3%} / {p_rel:.3%} |

North-star check (BASELINE.json): "U,p rel-L2 < 5%" ->
{'MET' if max(u_rel_t, p_rel_t) < 0.05 else 'NOT MET'} on trained geometries
(the reference's own evaluation setting — it fits one geometry set and
evaluates on resampled points), {'MET' if max(u_rel, p_rel) < 0.05 else 'NOT MET'}
on held-out geometries. For reference-hardware context: the same {epochs}-epoch
envelope takes ~12k sequential autograd-replay steps on the reference's
single GPU (estimated 4-8 min of pure step time; measured torch-CPU: weeks).
""")


if __name__ == "__main__":
    main(epochs=int(sys.argv[1]) if len(sys.argv) > 1 else 3000)
