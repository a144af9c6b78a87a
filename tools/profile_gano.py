"""Component-level timing of the plain PI-GANO training step at the bench
envelope: full step, derivative forward, and each encoder stage in isolation
(geometry PointNet-global, branch, points-encoder (v,J,H) local chain, fused
NeuralOperator trunk), with transfer-synced measurements.

Usage: python tools/profile_gano.py
"""
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def timed(fn, *args, n=15, warmup=2):
    from porous_cfd_tpu.utils import profiling
    dt, _ = profiling.timed(fn, *args, n=n, warmup=warmup)
    return round(dt * 1e3, 2)


def scan_delta_ms(make_out, n=30):
    """Device ms/iteration of ``make_out(eps_scalar) -> pytree``, measured as
    a scan of n vs 2n serialized iterations inside single jit programs (the
    delta cancels dispatch + sync latency; every output leaf is summed into
    the carry so nothing is dead-code-eliminated, and the carry feeds the
    next iteration so nothing is hoisted)."""
    import time

    import jax
    import jax.numpy as jnp

    def prog(length):
        @jax.jit
        def f(seed):
            def body(carry, _):
                out = make_out(carry)
                s = sum(jnp.sum(leaf)
                        for leaf in jax.tree_util.tree_leaves(out))
                return carry + s * 1e-30, ()
            c, _ = jax.lax.scan(body, seed, None, length=length)
            return c
        return f

    times = []
    for length in (n, 2 * n):
        f = prog(length)
        np.asarray(f(jnp.zeros(())))        # compile + warm
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            np.asarray(f(jnp.zeros(())))
            best = min(best, time.perf_counter() - t0)
        times.append(best)
    return round((times[1] - times[0]) / n * 1e3, 3)


def main():
    import jax
    import jax.numpy as jnp

    from bench import BATCH, N_BOUNDARY, N_CASES, N_INTERNAL, N_OBS, make_model
    from porous_cfd_tpu.data.foam_data import split_contiguous
    from porous_cfd_tpu.data.synthetic import make_foam_batch
    from porous_cfd_tpu.models.pi_gano import (_trunk_prop_dispatch,
                                               gather_parameters)
    from porous_cfd_tpu.models.pipn import _pointnet_global_dispatch
    from porous_cfd_tpu.physics import analytic
    from porous_cfd_tpu.train.engine import (gather_cases, make_optimizer,
                                             make_train_functions)
    from porous_cfd_tpu.utils.profiling import steps_per_sec

    rng = np.random.default_rng(8421)
    dataset = jax.device_put(make_foam_batch(
        N_CASES, N_INTERNAL, N_BOUNDARY, N_OBS, rng=rng))
    model, scaler = make_model("pi_gano")
    batch = gather_cases(dataset, jnp.arange(BATCH))
    tx = make_optimizer(model, N_CASES // BATCH)
    fns = make_train_functions(model, tx, loss_scaler=scaler)
    state = fns.init_state(batch)
    module = model.module
    act = module.activation

    report = {}
    rate, state = steps_per_sec(fns.train_step, state, batch, n_steps=20)
    report["train_step_ms"] = round(1e3 / rate, 2)
    params = state.params

    dapply = jax.jit(lambda p, b: model.derivative_apply(p, b, None, True))
    report["derivative_fwd_ms"] = timed(dapply, params, batch)

    internal_view, boundary_view = split_contiguous(batch)
    x_int, x_bnd = internal_view["C"], boundary_view["C"]
    pts_all = jnp.concatenate([x_int, x_bnd], axis=-2)
    geom_in = jnp.concatenate(
        [jnp.concatenate([batch["boundaryId"], batch["sdf"]], axis=-1),
         pts_all], axis=-1)
    par_features = gather_parameters(batch, module.variable_boundaries)

    def geom_fn(p):
        return _pointnet_global_dispatch(p["geometry_encoder"]["linear"],
                                         module.geometry_layers, geom_in, act)

    def branch_fn(p):
        return _pointnet_global_dispatch(p["branch"]["linear"],
                                         module.branch_layers, par_features,
                                         act)

    def local_fn(p):
        j0t, h0t = analytic.identity_jacobian_t(x_int)
        return analytic.mlp_prop_t(p["points_encoder"], module.local_layers,
                                   x_int, j0t, h0t, act)

    def trunk_fn(p):
        geom = geom_fn(p)
        par = branch_fn(p)
        lv_b = analytic.mlp_value(p["points_encoder"], module.local_layers,
                                  x_bnd, act)
        return _trunk_prop_dispatch(p, module, lambda transposed: local_fn(p),
                                    lv_b, geom, par, act, True, None)

    # scan-serialized device timings (delta method — no dispatch pollution).
    # eps perturbs the float inputs so XLA can neither hoist nor DCE.
    def perturb(tree, eps):
        return jax.tree_util.tree_map(
            lambda a: a + eps * 1e-30
            if jnp.issubdtype(a.dtype, jnp.floating) else a, tree)

    geom0, par0 = geom_fn(params), branch_fn(params)
    lv_b0 = analytic.mlp_value(params["points_encoder"], module.local_layers,
                               x_bnd, act)

    def local_trunk(eps):
        xi = x_int + eps * 1e-30

        def lv_fn(transposed=False):
            j0t, h0t = analytic.identity_jacobian_t(xi)
            return analytic.mlp_prop_t(params["points_encoder"],
                                       module.local_layers, xi, j0t, h0t, act)

        return _trunk_prop_dispatch(params, module, lv_fn, lv_b0, geom0,
                                    par0, act, True, None)

    report["scan_derivative_fwd_ms"] = scan_delta_ms(
        lambda e: model.derivative_apply(params, perturb(batch, e), None,
                                         True))
    report["scan_local+trunk_fwd_ms"] = scan_delta_ms(local_trunk)
    report["scan_local_vjh_ms"] = scan_delta_ms(
        lambda e: local_fn(perturb(params, e)))
    report["scan_geometry_ms"] = scan_delta_ms(
        lambda e: geom_fn(perturb(params, e)))
    report["scan_branch_ms"] = scan_delta_ms(
        lambda e: branch_fn(perturb(params, e)))
    from porous_cfd_tpu.train.engine import compute_losses
    key = jax.random.PRNGKey(0)

    def full_grad(e):
        def lf(p):
            losses, _ = compute_losses(model, p, batch, key,
                                       deterministic=False)
            return jnp.sum(losses)
        return jax.grad(lf)(perturb(params, e))

    report["scan_loss_grad_ms"] = scan_delta_ms(full_grad, n=10)

    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
