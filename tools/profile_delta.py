"""Scan-delta decomposition of the ++/PI-GANO train steps at the bench
envelope: device ms/iteration of each sub-program (forward AND fwd+bwd),
measured as n vs 2n serialized scan iterations inside single jit programs so
tunnel dispatch and sync latency cancel. Datasets get the SAME neighbor/input
precomputes bench.py attaches (``model.attach_neighbors``), so the numbers
decompose the real product step, not a strawman.

Usage: python tools/profile_delta.py [--family pipn_pp|pi_gano|pipn] [--n 20]
"""
import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--family", default="pipn_pp",
                    choices=["pipn_pp", "pi_gano", "pipn"])
    ap.add_argument("--n", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bench import BATCH, N_BOUNDARY, N_CASES, N_INTERNAL, N_OBS, make_model
    from porous_cfd_tpu.data.foam_data import split_contiguous
    from porous_cfd_tpu.data.synthetic import make_foam_batch
    from porous_cfd_tpu.train.engine import (compute_losses, gather_cases,
                                             make_optimizer,
                                             make_train_functions)

    def scan_delta_ms(make_out, n=args.n):
        def prog(length):
            @jax.jit
            def f(seed):
                def body(carry, _):
                    out = make_out(carry)
                    s = sum(jnp.sum(leaf)
                            for leaf in jax.tree_util.tree_leaves(out)
                            if jnp.issubdtype(leaf.dtype, jnp.floating))
                    return carry + s * 1e-30, ()
                c, _ = jax.lax.scan(body, seed, None, length=length)
                return c
            return f

        times = []
        for length in (n, 2 * n):
            f = prog(length)
            np.asarray(f(jnp.zeros(())))
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                np.asarray(f(jnp.zeros(())))
                best = min(best, time.perf_counter() - t0)
            times.append(best)
        return round((times[1] - times[0]) / n * 1e3, 3)

    def perturb(tree, eps):
        return jax.tree_util.tree_map(
            lambda a: a + eps * 1e-30
            if jnp.issubdtype(a.dtype, jnp.floating) else a, tree)

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
    act = module.activation
    key = jax.random.PRNGKey(0)

    report = {"family": args.family}

    # 1. full train step inside the scan (bench methodology, no dispatch)
    def step_once(eps):
        st, m = fns.train_step.__wrapped__(
            type(state)(state.step, perturb(params, eps), state.opt_state,
                        state.rng, state.scaler_state), batch)
        return m

    report["step_ms"] = scan_delta_ms(step_once, n=max(10, args.n // 2))

    # 2. loss gradient only (no optimizer update / metric assembly)
    def loss_grad(eps):
        def lf(p):
            losses, _ = compute_losses(model, p, batch, key,
                                       deterministic=False)
            return jnp.sum(losses)
        return jax.grad(lf)(perturb(params, eps))

    report["loss_grad_ms"] = scan_delta_ms(loss_grad, n=max(10, args.n // 2))

    # 3. losses forward only (derivative_apply + residual/loss assembly)
    def losses_fwd(eps):
        losses, _ = compute_losses(model, perturb(params, eps), batch, key,
                                   deterministic=False)
        return losses

    report["losses_fwd_ms"] = scan_delta_ms(losses_fwd)

    # 4. derivative_apply forward only
    def deriv_fwd(eps):
        return model.derivative_apply(perturb(params, eps), batch, key, False)

    if model.derivative_apply is not None:
        report["derivative_fwd_ms"] = scan_delta_ms(deriv_fwd)

        # 5. derivative_apply fwd + bwd (sum-of-outputs cotangent)
        def deriv_grad(eps):
            def lf(p):
                out, j, h = model.derivative_apply(p, batch, key, False)
                return jnp.sum(out) + jnp.sum(j) + jnp.sum(h)
            return jax.grad(lf)(perturb(params, eps))

        report["derivative_fwdbwd_ms"] = scan_delta_ms(
            deriv_grad, n=max(10, args.n // 2))

    # family-specific encoder pieces
    internal_view, boundary_view = split_contiguous(batch)
    x_int, x_bnd = internal_view["C"], boundary_view["C"]
    from porous_cfd_tpu.physics import analytic

    def local_prop(eps):
        p = perturb(params, eps)
        lp = (p["feature_extract"]["local_feature"]
              if args.family != "pi_gano" else p["points_encoder"])
        layers = (module.fe_local_layers if args.family != "pi_gano"
                  else module.local_layers)
        j0t, h0t = analytic.identity_jacobian_t(x_int)
        return analytic.mlp_prop_t(lp, layers, x_int, j0t, h0t, act)

    report["local_vjh_fwd_ms"] = scan_delta_ms(local_prop)

    if args.family == "pipn_pp":
        from porous_cfd_tpu.models.neighbors import extract_sa_neighbors
        from porous_cfd_tpu.ops import sa_pallas
        geom_in = jnp.concatenate([boundary_view["C"],
                                   boundary_view["boundaryId"]], axis=-1)
        nbrs = extract_sa_neighbors(batch.domain, len(module.fe_radius))
        geo_params = params["feature_extract"]["global_feature"]

        def sa_fwd(eps):
            return sa_pallas.sa_seq_fused(
                perturb(geo_params, eps), module.fe_fraction, module.fe_radius,
                module.fe_global_layers, module.max_neighbors, act, geom_in,
                x_bnd, nbrs)

        report["sa_fwd_ms"] = scan_delta_ms(sa_fwd)
        report["sa_fwdbwd_ms"] = scan_delta_ms(
            lambda e: jax.grad(lambda p: jnp.sum(sa_pallas.sa_seq_fused(
                p, module.fe_fraction, module.fe_radius,
                module.fe_global_layers, module.max_neighbors, act, geom_in,
                x_bnd, nbrs) ** 2))(perturb(geo_params, e)))

        # decoder kernel fwd and fwd+bwd in isolation
        from porous_cfd_tpu.models.pipn import _decoder_prop_dispatch
        g_const = jnp.zeros((BATCH, 1, module.fe_global_layers[-1][-1]))

        def dec(eps, with_grad):
            p = perturb(params, eps)

            def f(pp):
                j0, h0 = analytic.identity_jacobian_t(x_int)
                lv, lj, lh = analytic.mlp_prop_t(
                    pp["feature_extract"]["local_feature"],
                    module.fe_local_layers, x_int, j0, h0, act)
                lv_b = analytic.mlp_value(
                    pp["feature_extract"]["local_feature"],
                    module.fe_local_layers, x_bnd, act)
                out, j, h = _decoder_prop_dispatch(
                    pp["decoder"], module.seg_layers, lv.shape[-1], lv, lj,
                    lh, lv_b, g_const, act, module.seg_dropout, True, None)
                return jnp.sum(out ** 2) + jnp.sum(j ** 2) + jnp.sum(h ** 2)

            return jax.grad(f)(p) if with_grad else f(p)

        report["local+decoder_fwd_ms"] = scan_delta_ms(lambda e: dec(e, False))
        report["local+decoder_fwdbwd_ms"] = scan_delta_ms(
            lambda e: dec(e, True))

    if args.family == "pipn":
        from porous_cfd_tpu.models.pipn import (_decoder_prop_dispatch,
                                                _pointnet_global_dispatch,
                                                _winner_gather_ctx)
        from porous_cfd_tpu.ops import pointnet_pallas
        feats = jnp.concatenate([batch["boundaryId"], batch["sdf"]], axis=-1)
        n_int = x_int.shape[-2]
        feats_i, feats_b = feats[..., :n_int, :], feats[..., n_int:, :]
        fe = params["feature_extract"]
        w0 = params["decoder"]["linear_0"]["kernel"]

        def local_chain(p):
            j0, h0 = analytic.identity_jacobian_t(x_int)
            lv_i, lj, lh = analytic.mlp_prop_t(
                p["feature_extract"]["local_feature"],
                module.fe_local_layers, x_int, j0, h0, act)
            lv_b = analytic.mlp_value(p["feature_extract"]["local_feature"],
                                      module.fe_local_layers, x_bnd, act)
            return lv_i, lj, lh, lv_b

        def pointnet_only(eps):
            p = perturb(params, eps)
            lv_i, lj, lh, lv_b = local_chain(p)
            g_in = jnp.concatenate([
                jnp.concatenate([lv_i, feats_i], -1),
                jnp.concatenate([lv_b, feats_b], -1)], axis=-2)
            return pointnet_pallas.pointnet_global(
                p["feature_extract"]["global_feature"],
                module.fe_global_layers, g_in, act, return_argmax=True)

        report["local+pointnet_fwd_ms"] = scan_delta_ms(pointnet_only)

        def winner_ctx(eps, with_grad):
            p = perturb(params, eps)

            def f(pp):
                lv_i, lj, lh, lv_b = local_chain(pp)
                g, zj0, zh0 = _winner_gather_ctx(
                    pp["feature_extract"], module, lv_i, lj, lh, lv_b,
                    feats_i, feats_b,
                    pp["decoder"]["linear_0"]["kernel"][lv_i.shape[-1]:], act)
                return jnp.sum(g ** 2) + jnp.sum(zj0 ** 2) + jnp.sum(zh0 ** 2)

            return jax.grad(f)(p) if with_grad else f(p)

        report["local+winnerctx_fwd_ms"] = scan_delta_ms(
            lambda e: winner_ctx(e, False))
        report["local+winnerctx_fwdbwd_ms"] = scan_delta_ms(
            lambda e: winner_ctx(e, True))

        def dec_path(eps, coupled, with_grad):
            p = perturb(params, eps)

            def f(pp):
                lv_i, lj, lh, lv_b = local_chain(pp)
                if coupled:
                    g, zj0, zh0 = _winner_gather_ctx(
                        pp["feature_extract"], module, lv_i, lj, lh, lv_b,
                        feats_i, feats_b,
                        pp["decoder"]["linear_0"]["kernel"][lv_i.shape[-1]:],
                        act)
                else:
                    local_all = jnp.concatenate([lv_i, lv_b], axis=-2)
                    g = _pointnet_global_dispatch(
                        pp["feature_extract"]["global_feature"],
                        module.fe_global_layers,
                        jnp.concatenate([local_all, feats], axis=-1), act)
                    zj0 = zh0 = None
                from porous_cfd_tpu.ops import decoder_pallas
                out, j, h = decoder_pallas.decoder_prop(
                    pp["decoder"], module.seg_layers, lv_i.shape[-1],
                    lv_i, lj, lh, lv_b, g, act,
                    dropout=module.seg_dropout, deterministic=False,
                    rng=key, j0_add=zj0, h0_add=zh0)
                return jnp.sum(out ** 2) + jnp.sum(j ** 2) + jnp.sum(h ** 2)

            return jax.grad(f)(p) if with_grad else f(p)

        for label, coupled in [("coupled", True), ("decoupled", False)]:
            report[f"full_{label}_fwd_ms"] = scan_delta_ms(
                lambda e, c=coupled: dec_path(e, c, False))
            report[f"full_{label}_fwdbwd_ms"] = scan_delta_ms(
                lambda e, c=coupled: dec_path(e, c, True))

    if args.family == "pi_gano":
        from porous_cfd_tpu.models.pi_gano import _trunk_prop_dispatch
        from porous_cfd_tpu.models.pipn import _pointnet_global_dispatch
        geom_full = batch.domain["_gano_geom_in"]
        par_features = batch.domain["_gano_par"]

        def geom_fn(p):
            return _pointnet_global_dispatch(p["geometry_encoder"]["linear"],
                                             module.geometry_layers,
                                             geom_full, act)

        def branch_fn(p):
            return _pointnet_global_dispatch(p["branch"]["linear"],
                                             module.branch_layers,
                                             par_features, act)

        report["geometry_fwd_ms"] = scan_delta_ms(
            lambda e: geom_fn(perturb(params, e)))
        report["branch_fwd_ms"] = scan_delta_ms(
            lambda e: branch_fn(perturb(params, e)))

        geom0, par0 = geom_fn(params), branch_fn(params)
        lv_b0 = analytic.mlp_value(params["points_encoder"],
                                   module.local_layers, x_bnd, act)

        def trunk(eps, with_grad):
            p = perturb(params, eps)

            def f(pp):
                def lv_fn(transposed=False):
                    j0t, h0t = analytic.identity_jacobian_t(x_int)
                    return analytic.mlp_prop_t(pp["points_encoder"],
                                               module.local_layers, x_int,
                                               j0t, h0t, act)
                out, j, h = _trunk_prop_dispatch(pp, module, lv_fn, lv_b0,
                                                 geom0, par0, act, True, None)
                return jnp.sum(out ** 2) + jnp.sum(j ** 2) + jnp.sum(h ** 2)

            return jax.grad(f)(p) if with_grad else f(p)

        report["local+trunk_fwd_ms"] = scan_delta_ms(lambda e: trunk(e, False))
        report["local+trunk_fwdbwd_ms"] = scan_delta_ms(
            lambda e: trunk(e, True))

    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
