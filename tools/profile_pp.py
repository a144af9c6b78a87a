"""Component-level timing of the PIPN++ training step at the bench envelope:
where do the milliseconds go? Times jitted sub-programs of the analytic fast
path (SA geometry chain fwd / fwd+bwd, local+decoder propagation, full
derivative forward, full train step) with transfer-synced measurements.

Usage: python tools/profile_pp.py [--family pipn_pp|pi_gano]
"""
import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def timed(fn, *args, n=15, warmup=2):
    from porous_cfd_tpu.utils import profiling
    dt, _ = profiling.timed(fn, *args, n=n, warmup=warmup)
    return round(dt * 1e3, 2)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--family", default="pipn_pp",
                    choices=["pipn_pp", "pi_gano"])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bench import BATCH, N_BOUNDARY, N_CASES, N_INTERNAL, N_OBS, make_model
    from porous_cfd_tpu.data.foam_data import split_contiguous
    from porous_cfd_tpu.data.synthetic import make_foam_batch
    from porous_cfd_tpu.train.engine import (gather_cases, make_optimizer,
                                             make_train_functions)

    rng = np.random.default_rng(8421)
    dataset = jax.device_put(make_foam_batch(
        N_CASES, N_INTERNAL, N_BOUNDARY, N_OBS, rng=rng))
    model, scaler = make_model(args.family)
    dataset = jax.device_put(model.attach_neighbors(dataset))
    batch = gather_cases(dataset, jnp.arange(BATCH))
    tx = make_optimizer(model, N_CASES // BATCH)
    fns = make_train_functions(model, tx, loss_scaler=scaler)
    state = fns.init_state(batch)
    params = state.params
    module = model.module

    report = {"family": args.family}

    # full step first (train_step donates its state: re-read params after)
    from porous_cfd_tpu.utils.profiling import steps_per_sec
    rate, state = steps_per_sec(fns.train_step, state, batch, n_steps=20)
    report["train_step_ms"] = round(1e3 / rate, 2)
    params = state.params

    dapply = jax.jit(lambda p, b: model.derivative_apply(p, b, None, True))
    report["derivative_fwd_ms"] = timed(dapply, params, batch)

    # geometry SA chain in isolation (fwd and fwd+bwd)
    internal_view, boundary_view = split_contiguous(batch)
    x_bnd = boundary_view["C"]
    act = module.activation
    from porous_cfd_tpu.models.neighbors import extract_sa_neighbors
    from porous_cfd_tpu.ops import sa_pallas

    if args.family == "pipn_pp":
        geom_in = jnp.concatenate([boundary_view["C"],
                                   boundary_view["boundaryId"]], axis=-1)
        nbrs = extract_sa_neighbors(batch.domain, len(module.fe_radius))
        geo_params = params["feature_extract"]["global_feature"]
        fractions, radii = module.fe_fraction, module.fe_radius
        conv = module.fe_global_layers
    else:
        geom_in = jnp.concatenate([x_bnd, boundary_view["boundaryId"]],
                                  axis=-1)
        nbrs = extract_sa_neighbors(batch.domain,
                                    len(module.geometry_radius))
        geo_params = params["geometry_encoder"]["set_abstraction"]
        fractions, radii = module.geometry_fraction, module.geometry_radius
        conv = module.geometry_layers

    if nbrs is not None:
        def sa_fused(p):
            return sa_pallas.sa_seq_fused(p, fractions, radii, conv,
                                          module.max_neighbors, act, geom_in,
                                          x_bnd, nbrs)

        from porous_cfd_tpu.models.set_abstraction import SetAbstractionSeq
        seq = SetAbstractionSeq(fractions, radii, conv, return_skip=False,
                                activation=act,
                                max_neighbors=module.max_neighbors)

        def sa_xla(p):
            out = seq.apply({"params": p}, geom_in, x_bnd, True, nbrs)
            return out[0] if isinstance(out, tuple) else out

        for name, fn in [("sa_fused", sa_fused), ("sa_xla", sa_xla)]:
            report[f"{name}_fwd_ms"] = timed(jax.jit(fn), geo_params)
            g = jax.jit(jax.grad(lambda p: jnp.sum(fn(p) ** 2)))
            report[f"{name}_fwdbwd_ms"] = timed(g, geo_params)

    # local chain + decoder propagation in isolation (params grad)
    if args.family == "pipn_pp":
        from porous_cfd_tpu.models.pipn import _decoder_prop_dispatch
        from porous_cfd_tpu.physics import analytic
        x_int = internal_view["C"]
        g_const = jnp.zeros((BATCH, 1, conv[-1][-1]))

        def dec(p):
            j0, h0 = analytic.identity_jacobian_t(x_int)
            lv, lj, lh = analytic.mlp_prop_t(
                p["feature_extract"]["local_feature"],
                module.fe_local_layers, x_int, j0, h0, act)
            lv_b = analytic.mlp_value(p["feature_extract"]["local_feature"],
                                      module.fe_local_layers, x_bnd, act)
            out, j, h = _decoder_prop_dispatch(
                p["decoder"], module.seg_layers, lv.shape[-1], lv, lj, lh,
                lv_b, g_const, act, module.seg_dropout, True, None)
            return jnp.sum(out ** 2) + jnp.sum(j ** 2) + jnp.sum(h ** 2)

        report["local+decoder_fwd_ms"] = timed(jax.jit(dec), params)
        report["local+decoder_fwdbwd_ms"] = timed(
            jax.jit(jax.grad(dec)), params)

    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
