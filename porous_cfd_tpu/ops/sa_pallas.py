"""Fused Pallas TPU kernel for SetAbstraction radius neighborhoods.

The measured ++-family bottleneck (round 3 ablation, BASELINE.md): at the
bench envelope the XLA SetAbstraction spends most of its time in the
per-step neighbor *gathers* (``take_along_axis`` lowers to row-wise TPU
gathers over narrow rows) and in HBM round-trips of the (B, C, K, F)
neighborhood intermediates. An earlier kernel that still gathered its inputs
with XLA gathers was no faster than the dense path — the gathers themselves
were the cost, hidden in a prior measurement by constant folding.

This kernel eliminates both:

  * the *static* geometry — normalized relative positions (B, C, K, D) — is
    precomputed once per run (``models.neighbors.sa_chain_precompute``:
    point clouds never change across epochs) and streamed, never gathered
    per step;
  * the *dynamic* features enter as the densely-projected first layer
    ``P = x @ W0x + b0`` (an (N, F1) matmul with no K factor), and the
    per-neighborhood gather of ``P`` happens INSIDE the kernel as a one-hot
    matmul: each grid block builds its (G*K, N) selection matrix in VMEM
    from the neighbor indices and rides the MXU with a full-lane (F1-wide)
    output — no TPU gather instruction anywhere;
  * each block then adds the relative-position term ``rel @ W0r``, runs the
    remaining activated layers and the masked max per neighborhood, all
    VMEM-resident; only the (B, C, F_out) result is written.

The backward kernel recomputes the chain per block, routes each
neighborhood's cotangent to its argmax row, accumulates weight gradients
across the grid, and scatters ``dP`` with the transposed one-hot matmul
(again no scatter instruction). ``dx`` then falls out of XLA's autodiff of
the dense projection.

Semantics match ``models/set_abstraction.SetAbstraction`` (reference
``models/modules.py:295-325``): empty neighborhoods yield 0; max-pool ties
route the cotangent to the first maximal row (XLA splits exact ties evenly —
measure-zero for continuous activations, same documented deviation as
ops/pointnet_pallas.py). Relative positions are data (no position
cotangent) — valid for the boundary-cloud geometry branches, whose
coordinates are stop-gradient in the reference (pi_gano_pp.py:71-72) or
plain inputs; the all-points U-Net encoders keep the XLA path.
"""
from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from porous_cfd_tpu.ops.decoder_pallas import (_RULES, _activation_name, _dot,
                                               _dot_t, _outer, on_tpu)

NEG = float(jnp.finfo(jnp.float32).min)


def _onehot(idx_ref, g_block, k, n_src):
    """(G*K, N) selection matrix from the (G*K, 1) neighbor-index block.
    The indices arrive pre-flattened with a trailing singleton lane — Mosaic
    cannot shape-cast a lane axis into sublanes in-kernel."""
    rows = g_block * k
    idx = idx_ref[0]                                     # (rows, 1)
    cols = jax.lax.broadcasted_iota(jnp.int32, (rows, n_src), 1)
    return (cols == idx).astype(jnp.float32)


def _fwd_kernel(cfg, *refs):
    widths, act_name, g_block, k, nl, n_src, static = cfg
    rules = _RULES[act_name]
    it = iter(refs)
    if static:
        # pre-gathered static input rows (see sa_chain_precompute feats):
        # first layer is a plain small matmul, no one-hot gather at all
        xg_ref = next(it)
        rel_ref = next(it)
        mask_ref = next(it)
        w0x_ref = next(it)
        w0r_ref = next(it)
        b0_ref = next(it)
    else:
        p_ref = next(it)
        rel_ref = next(it)
        idx_ref = next(it)
        mask_ref = next(it)
        w0r_ref = next(it)
    ws = [next(it) for _ in range(nl - 1)]
    bs = [next(it) for _ in range(nl - 1)]
    out_ref = next(it)

    if static:
        z0 = (_dot(xg_ref[0], w0x_ref[...]) + _dot(rel_ref[0], w0r_ref[...])
              + b0_ref[...])
    else:
        onehot = _onehot(idx_ref, g_block, k, n_src)
        z0 = _dot(onehot, p_ref[0]) + _dot(rel_ref[0], w0r_ref[...])
    h = rules(z0)[0]
    for i in range(nl - 1):
        h = rules(_dot(h, ws[i][...]) + bs[i][...])[0]

    mask = mask_ref[0]                                   # (G, K)
    hm = h.reshape(g_block, k, h.shape[-1])
    m = jnp.max(jnp.where(mask[..., None] > 0, hm, NEG), axis=1)
    any_valid = jnp.sum(mask, axis=1, keepdims=True) > 0
    out_ref[0] = jnp.where(any_valid, m, 0.0)


def _bwd_kernel(cfg, *refs):
    widths, act_name, g_block, k, nl, n_src, static = cfg
    rules = _RULES[act_name]
    it = iter(refs)
    if static:
        xg_ref = next(it)
        rel_ref = next(it)
        mask_ref = next(it)
        w0x_ref = next(it)
        w0r_ref = next(it)
        b0_ref = next(it)
    else:
        p_ref = next(it)
        rel_ref = next(it)
        idx_ref = next(it)
        mask_ref = next(it)
        w0r_ref = next(it)
    ws = [next(it) for _ in range(nl - 1)]
    bs = [next(it) for _ in range(nl - 1)]
    dout_ref = next(it)
    if static:
        dw0x_ref = next(it)
        dw0r_ref = next(it)
        db0_ref = next(it)
    else:
        dp_ref = next(it)
        dw0r_ref = next(it)
    dws = [next(it) for _ in range(nl - 1)]
    dbs = [next(it) for _ in range(nl - 1)]

    b, t = pl.program_id(0), pl.program_id(1)

    @pl.when(jnp.logical_and(b == 0, t == 0))
    def _init_weights():
        dw0r_ref[...] = jnp.zeros_like(dw0r_ref)
        if static:
            dw0x_ref[...] = jnp.zeros_like(dw0x_ref)
            db0_ref[...] = jnp.zeros_like(db0_ref)
        for r in dws + dbs:
            r[...] = jnp.zeros_like(r)

    if not static:
        @pl.when(t == 0)
        def _init_dp():
            dp_ref[...] = jnp.zeros_like(dp_ref)

    # forward recompute, stashing pre-activations + layer inputs
    if static:
        z0 = (_dot(xg_ref[0], w0x_ref[...]) + _dot(rel_ref[0], w0r_ref[...])
              + b0_ref[...])
    else:
        onehot = _onehot(idx_ref, g_block, k, n_src)
        z0 = _dot(onehot, p_ref[0]) + _dot(rel_ref[0], w0r_ref[...])
    zs, a_in = [z0], []
    a = rules(z0)[0]
    for i in range(nl - 1):
        a_in.append(a)
        z = _dot(a, ws[i][...]) + bs[i][...]
        zs.append(z)
        a = rules(z)[0]

    # masked-max backward: route each neighborhood's cotangent to the argmax
    mask = mask_ref[0]                                   # (G, K)
    f_out = a.shape[-1]
    hm = a.reshape(g_block, k, f_out)
    filled = jnp.where(mask[..., None] > 0, hm, NEG)
    arg = jnp.argmax(filled, axis=1)                     # (G, F)
    any_valid = jnp.sum(mask, axis=1, keepdims=True) > 0
    dout = jnp.where(any_valid, dout_ref[0], 0.0)        # (G, F)
    k_iota = jax.lax.broadcasted_iota(jnp.int32, (g_block, k, f_out), 1)
    g = jnp.where(k_iota == arg[:, None, :], dout[:, None, :], 0.0)
    g = g.reshape(g_block * k, f_out)

    for i in range(nl - 2, -1, -1):
        gz = g * rules(zs[i + 1])[1]
        dws[i][...] += _outer(a_in[i], gz)
        dbs[i][...] += jnp.sum(gz, axis=0, keepdims=True)
        g = _dot_t(gz, ws[i][...])
    gz0 = g * rules(zs[0])[1]
    if static:
        dw0x_ref[...] += _outer(xg_ref[0], gz0)
        db0_ref[...] += jnp.sum(gz0, axis=0, keepdims=True)
    else:
        dp_ref[0] += _outer(onehot, gz0)                 # transposed one-hot
    dw0r_ref[...] += _outer(rel_ref[0], gz0)


@lru_cache(maxsize=None)
def _build(widths, act_name, n_cases, n_cent, k, n_src, n_dims, g_block,
           interpret):
    nl = len(widths)
    f1, f_out = widths[0], widths[-1]
    grid = (n_cases, n_cent // g_block)
    cfg = (widths, act_name, g_block, k, nl, n_src, False)
    rows = g_block * k

    p_spec = pl.BlockSpec((1, n_src, f1), lambda b, t: (b, 0, 0))
    rel_spec = pl.BlockSpec((1, rows, n_dims), lambda b, t: (b, t, 0))
    idx_spec = pl.BlockSpec((1, rows, 1), lambda b, t: (b, t, 0))
    mask_spec = pl.BlockSpec((1, g_block, k), lambda b, t: (b, t, 0))
    w0r_spec = pl.BlockSpec((n_dims, f1), lambda b, t: (0, 0))
    w_specs = [pl.BlockSpec((widths[i], widths[i + 1]), lambda b, t: (0, 0))
               for i in range(nl - 1)]
    b_specs = [pl.BlockSpec((1, widths[i + 1]), lambda b, t: (0, 0))
               for i in range(nl - 1)]
    out_spec = pl.BlockSpec((1, g_block, f_out), lambda b, t: (b, t, 0))

    def run_fwd(p, rel, idxf, maskf, w0r, ws, bs):
        return pl.pallas_call(
            partial(_fwd_kernel, cfg), grid=grid,
            in_specs=[p_spec, rel_spec, idx_spec, mask_spec, w0r_spec]
            + w_specs + b_specs,
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct((n_cases, n_cent, f_out),
                                           jnp.float32),
            interpret=interpret,
        )(p, rel, idxf, maskf, w0r, *ws, *bs)

    @jax.custom_vjp
    def fn(p, rel, idxf, maskf, w0r, ws, bs):
        return run_fwd(p, rel, idxf, maskf, w0r, ws, bs)

    def fn_fwd(p, rel, idxf, maskf, w0r, ws, bs):
        return run_fwd(p, rel, idxf, maskf, w0r, ws, bs), (
            p, rel, idxf, maskf, w0r, ws, bs)

    def fn_bwd(saved, dout):
        p, rel, idxf, maskf, w0r, ws, bs = saved
        res = pl.pallas_call(
            partial(_bwd_kernel, cfg), grid=grid,
            in_specs=[p_spec, rel_spec, idx_spec, mask_spec, w0r_spec]
            + w_specs + b_specs + [out_spec],
            out_specs=[p_spec, w0r_spec] + w_specs + b_specs,
            out_shape=([jax.ShapeDtypeStruct(p.shape, jnp.float32),
                        jax.ShapeDtypeStruct(w0r.shape, jnp.float32)]
                       + [jax.ShapeDtypeStruct(w.shape, jnp.float32)
                          for w in ws]
                       + [jax.ShapeDtypeStruct(b.shape, jnp.float32)
                          for b in bs]),
            interpret=interpret,
        )(p, rel, idxf, maskf, w0r, *ws, *bs, dout)
        dp, dw0r = res[0], res[1]
        f0 = jax.dtypes.float0
        return (dp, jnp.zeros_like(rel), np.zeros(idxf.shape, f0),
                jnp.zeros_like(maskf), dw0r,
                tuple(res[2:2 + nl - 1]), tuple(res[1 + nl:]))

    fn.defvjp(fn_fwd, fn_bwd)
    return fn


@lru_cache(maxsize=None)
def _build_static(widths, act_name, n_cases, n_cent, k, f_in, n_dims,
                  g_block, interpret):
    """Kernel variant for level-0 neighborhoods whose inputs are static DATA
    (pre-gathered by sa_chain_precompute): the first layer consumes the
    (rows, f_in) gathered block directly — no one-hot gather matmul forward,
    no transposed-one-hot scatter backward, no dp output."""
    nl = len(widths)
    f1, f_out = widths[0], widths[-1]
    grid = (n_cases, n_cent // g_block)
    cfg = (widths, act_name, g_block, k, nl, 0, True)
    rows = g_block * k

    xg_spec = pl.BlockSpec((1, rows, f_in), lambda b, t: (b, t, 0))
    rel_spec = pl.BlockSpec((1, rows, n_dims), lambda b, t: (b, t, 0))
    mask_spec = pl.BlockSpec((1, g_block, k), lambda b, t: (b, t, 0))
    w0x_spec = pl.BlockSpec((f_in, f1), lambda b, t: (0, 0))
    w0r_spec = pl.BlockSpec((n_dims, f1), lambda b, t: (0, 0))
    b0_spec = pl.BlockSpec((1, f1), lambda b, t: (0, 0))
    w_specs = [pl.BlockSpec((widths[i], widths[i + 1]), lambda b, t: (0, 0))
               for i in range(nl - 1)]
    b_specs = [pl.BlockSpec((1, widths[i + 1]), lambda b, t: (0, 0))
               for i in range(nl - 1)]
    out_spec = pl.BlockSpec((1, g_block, f_out), lambda b, t: (b, t, 0))

    def run_fwd(xg, rel, maskf, w0x, w0r, b0, ws, bs):
        return pl.pallas_call(
            partial(_fwd_kernel, cfg), grid=grid,
            in_specs=[xg_spec, rel_spec, mask_spec, w0x_spec, w0r_spec,
                      b0_spec] + w_specs + b_specs,
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct((n_cases, n_cent, f_out),
                                           jnp.float32),
            interpret=interpret,
        )(xg, rel, maskf, w0x, w0r, b0, *ws, *bs)

    @jax.custom_vjp
    def fn(xg, rel, maskf, w0x, w0r, b0, ws, bs):
        return run_fwd(xg, rel, maskf, w0x, w0r, b0, ws, bs)

    def fn_fwd(xg, rel, maskf, w0x, w0r, b0, ws, bs):
        return run_fwd(xg, rel, maskf, w0x, w0r, b0, ws, bs), (
            xg, rel, maskf, w0x, w0r, b0, ws, bs)

    def fn_bwd(saved, dout):
        xg, rel, maskf, w0x, w0r, b0, ws, bs = saved
        res = pl.pallas_call(
            partial(_bwd_kernel, cfg), grid=grid,
            in_specs=[xg_spec, rel_spec, mask_spec, w0x_spec, w0r_spec,
                      b0_spec] + w_specs + b_specs + [out_spec],
            out_specs=[w0x_spec, w0r_spec, b0_spec] + w_specs + b_specs,
            out_shape=([jax.ShapeDtypeStruct(w0x.shape, jnp.float32),
                        jax.ShapeDtypeStruct(w0r.shape, jnp.float32),
                        jax.ShapeDtypeStruct(b0.shape, jnp.float32)]
                       + [jax.ShapeDtypeStruct(w.shape, jnp.float32)
                          for w in ws]
                       + [jax.ShapeDtypeStruct(b.shape, jnp.float32)
                          for b in bs]),
            interpret=interpret,
        )(xg, rel, maskf, w0x, w0r, b0, *ws, *bs, dout)
        dw0x, dw0r, db0 = res[0], res[1], res[2]
        return (jnp.zeros_like(xg), jnp.zeros_like(rel),
                jnp.zeros_like(maskf), dw0x, dw0r, db0,
                tuple(res[3:3 + nl - 1]), tuple(res[2 + nl:]))

    fn.defvjp(fn_fwd, fn_bwd)
    return fn


def _gather(arr, idx):
    """arr (B, N, F), idx (B, ...) -> (B, ..., F)."""
    return jax.vmap(lambda a, i: a[i])(arr, idx)


import os

# Rows (G*K) per grid block. Bigger blocks amortize per-grid-step overhead
# and feed the MXU taller operands; the cap keeps the backward recompute's
# per-layer stashes within VMEM for the widest conv stacks (<=256 lanes).
SA_BLOCK_ROWS = int(os.environ.get("PCT_SA_ROWS", "4096"))
# The dynamic (in-kernel one-hot gather) variant additionally materializes a
# (rows, n_src) f32 selection matrix in VMEM; bound it to ~2 MB. The bound
# only applies above the 512-row floor in _pick_g — at n_src > 1024 the floor
# wins and the matrix grows past 2 MB (8 MB at n_src=4096), trading VMEM for
# enough rows to keep the MXU fed (ADVICE r4: floor kept deliberately).
SA_ONEHOT_BYTES = int(os.environ.get("PCT_SA_ONEHOT_BYTES", str(2 << 20)))
# Scoped-VMEM budget for the backward kernel's per-block recompute stash.
# The bwd kernel re-runs the conv stack per block and keeps every
# intermediate (rows, width) activation plus the (rows, f_in + n_dims)
# inputs live while accumulating weight grads; measured on-chip this costs
# ~13.8 bytes per stash float per row (the ~3.4x over the raw f32 footprint
# is Mosaic double-buffering + grad accumulators; calibrated on the observed
# 24.53 MiB at 4096 rows for a 64-128-256 stack with f_in=6, n_dims=2).
# Deep/wide stacks (e.g. the MRG level convs) blow the 16 MiB scoped limit
# at 4096 rows — cap rows so the modeled stash stays under this budget.
SA_BWD_BYTES = int(os.environ.get("PCT_SA_BWD_BYTES", str(14 << 20)))
_BWD_BYTES_PER_STASH_FLOAT = 13.8


def _pick_g(n_cent: int, k: int, n_src: int = 0,
            stash_floats: int = 0) -> int:
    """Neighborhoods per grid block: keep G*K rows around SA_BLOCK_ROWS, G*K
    a multiple of 8 (f32 sublanes), and G no larger than the centroid count
    (the centroid axis is padded to a multiple of G). ``n_src > 0`` marks the
    dynamic one-hot variant, whose (G*K, n_src) VMEM selection matrix caps
    the rows. ``stash_floats`` (f_in + n_dims + sum of conv widths) caps the
    rows so the backward recompute stash fits scoped VMEM (SA_BWD_BYTES)."""
    rows = SA_BLOCK_ROWS
    if n_src > 0:
        rows = min(rows, max(512, SA_ONEHOT_BYTES // (4 * n_src)))
    if stash_floats > 0:
        rows = min(rows, max(512, int(
            SA_BWD_BYTES / (_BWD_BYTES_PER_STASH_FLOAT * stash_floats))))
    g = min(max(1, rows // k), max(1, n_cent))
    # the (1, G, K) mask / (1, G, F) out block specs require G % 8 == 0
    # (Pallas TPU sublane divisibility) unless G covers the padded axis
    if g > 8:
        g -= g % 8
    while (g * k) % 8 != 0:
        g += 1
    return g


def sa_neighborhood(params: dict, mlp_layers, x, pos, idx, mask, r: float,
                    activation, rel=None, xg=None,
                    interpret: bool | None = None):
    """Fused SetAbstraction level: masked max over neighbors of
    ``MLP([x_j || (pos_j - pos_c)/r])``.

    :param params: ``conv_mlp`` parameter tree (``linear_i``: kernel/bias);
        layer 0's kernel rows split into the feature block ``W0x`` (applied
        densely over the N source points) and the relative-position block
        ``W0r`` (applied in-kernel on the precomputed rel).
    :param x: (B, N, F_in) source features; pos (B, N, D).
    :param idx: (B, C, K) int32 neighbor indices; mask (B, C, K) validity.
    :param rel: (B, C, K, D) precomputed normalized relative positions
        (``sa_chain_precompute``); computed on the fly when absent (slower:
        per-step XLA gathers).
    :param xg: optional (B, C*K, F_in) PRE-GATHERED static input features
        (``sa_chain_precompute`` feats). When given, ``x`` is ignored: the
        first layer runs directly on the gathered rows, eliminating the
        per-step in-kernel one-hot gather (valid only when x is data with no
        gradient — level 0 of the boundary-cloud branches).
    :return: (B, C, F_last) pooled features.
    """
    if interpret is None:
        interpret = not on_tpu()
    act = _activation_name(activation)
    nl = len(mlp_layers) - 1
    f_in = x.shape[-1]
    n_dims = pos.shape[-1]
    w0 = params["linear_0"]["kernel"].astype(jnp.float32)
    b0 = params["linear_0"]["bias"].astype(jnp.float32)
    ws = tuple(params[f"linear_{i}"]["kernel"].astype(jnp.float32)
               for i in range(1, nl))
    bs = tuple(params[f"linear_{i}"]["bias"][None, :].astype(jnp.float32)
               for i in range(1, nl))

    if rel is None:
        raise ValueError(
            "sa_neighborhood requires precomputed rel; use "
            "models.neighbors.sa_chain_precompute (stores sa_rel_i)")

    b_cases, n_cent, k = idx.shape
    n_src = x.shape[-2]
    stash = f_in + n_dims + int(sum(mlp_layers[1:]))
    g_block = _pick_g(n_cent, k, 0 if xg is not None else n_src, stash)
    pad = (-n_cent) % g_block
    maskf = mask.astype(jnp.float32)
    relf = rel.astype(jnp.float32)
    if pad:
        relf = jnp.pad(relf, ((0, 0), (0, pad), (0, 0), (0, 0)))
        maskf = jnp.pad(maskf, ((0, 0), (0, pad), (0, 0)))
    cp = n_cent + pad

    if xg is not None:
        xgf = xg.astype(jnp.float32)
        if pad:
            xgf = jnp.pad(xgf, ((0, 0), (0, pad * k), (0, 0)))
        fn = _build_static(tuple(mlp_layers[1:]), act, b_cases, cp, k, f_in,
                           n_dims, g_block, interpret)
        out = fn(xgf, relf.reshape(b_cases, cp * k, -1), maskf,
                 w0[:f_in], w0[f_in:], b0[None, :], ws, bs)
        return out[:, :n_cent] if pad else out

    # dense first-layer feature projection: no K factor, no gather
    p_dense = x.astype(jnp.float32) @ w0[:f_in] + b0      # (B, N, F1)
    idxf = idx.astype(jnp.int32)
    if pad:
        idxf = jnp.pad(idxf, ((0, 0), (0, pad), (0, 0)))

    fn = _build(tuple(mlp_layers[1:]), act, b_cases, cp, k, n_src, n_dims,
                g_block, interpret)
    out = fn(p_dense, relf.reshape(b_cases, cp * k, -1),
             idxf.reshape(b_cases, cp * k, 1), maskf, w0[f_in:], ws, bs)
    return out[:, :n_cent] if pad else out


def _level_rel(entry, pos, r):
    """(idx, mask, rel) from a neighbor-chain entry, computing rel on the
    fly (slow XLA-gather path) when the chain predates rel precompute."""
    if len(entry) >= 4:
        return entry[1], entry[2], entry[3]
    cent, idx, mask = entry[:3]
    pos_c = _gather(pos, cent)
    rel = (_gather(pos, idx) - pos_c[..., None, :]) / r
    return idx, mask, rel


def sa_seq_fused(params: dict, fractions, radii, conv_mlp, max_neighbors: int,
                 activation, x, pos, neighbors, return_last_pos: bool = False,
                 interpret: bool | None = None):
    """Raw-params counterpart of ``SetAbstractionSeq`` (value path) routing
    every radius level through the fused kernel and a trailing
    GlobalSetAbstraction (when ``len(conv_mlp) > len(radii)``) through the
    fused pointnet kernel. ``neighbors`` is the precomputed chain from
    ``models.neighbors.sa_chain_precompute`` (required — the fused path is
    only engaged for static precomputed clouds).

    :return: (B, C_last, F) features (and the last positions when
        ``return_last_pos``).
    """
    from porous_cfd_tpu.ops import pointnet_pallas

    for i, (r, layers) in enumerate(zip(radii, conv_mlp)):
        entry = neighbors[i]
        idx, mask, rel = _level_rel(entry, pos, r)
        xg = entry[5] if (i == 0 and len(entry) >= 6) else None
        x = sa_neighborhood(params[f"sa_{i}"]["conv_mlp"], layers, x, pos,
                            idx, mask, r, activation, rel=rel, xg=xg,
                            interpret=interpret)
        pos = entry[4] if len(entry) >= 5 else _gather(pos, entry[0])
    if len(conv_mlp) > len(radii):
        g = pointnet_pallas.pointnet_global(
            params["global_sa"]["mlp"], conv_mlp[-1],
            jnp.concatenate([x, pos], axis=-1), activation,
            interpret=interpret)
        pos = jnp.zeros((*pos.shape[:-2], 1, pos.shape[-1]), pos.dtype)
        x = g
    return (x, pos) if return_last_pos else x


def sa_mrg_fused(params: dict, in_features: int, n_dims: int, activation,
                 max_neighbors: int, x, pos, neighbors,
                 interpret: bool | None = None):
    """Raw-params counterpart of ``SetAbstractionMrgSeq`` (value path): the
    three radius-SA branches through the fused neighborhood kernel, the two
    global branches through the fused pointnet kernel. Layer sizes and the
    shared 2-level neighbor chain mirror the module exactly
    (models/set_abstraction.py:144-187)."""
    from porous_cfd_tpu.ops import pointnet_pallas

    nb0, nb1 = neighbors
    d = n_dims

    def level(key, layers, xx, pp, nb, r):
        idx, mask, rel = _level_rel(nb, pp, r)
        xg = nb[5] if len(nb) >= 6 else None
        out = sa_neighborhood(params[key]["conv_mlp"], layers, xx, pp, idx,
                              mask, r, activation, rel=rel, xg=xg,
                              interpret=interpret)
        return out, (nb[4] if len(nb) >= 5 else _gather(pp, nb[0]))

    x1, p1 = level("branch1_sa0", [in_features + d, 64, 128], x, pos, nb0, 0.5)
    x1, p1 = level("branch1_sa1", [128 + d, 256], x1, p1, nb1, 1.0)
    x2, p2 = level("branch2_sa", [in_features + d, 64, 128, 256], x, pos, nb0,
                   0.5)
    x3 = pointnet_pallas.pointnet_global(
        params["branch3_gsa"]["mlp"], [in_features + d, 128, 256, 512],
        jnp.concatenate([x, pos], axis=-1), activation, interpret=interpret)
    x12 = jnp.concatenate([x1, x2], axis=-2)
    p12 = jnp.concatenate([p1, p2], axis=-2)
    x4 = pointnet_pallas.pointnet_global(
        params["branch4_gsa"]["mlp"], [256 + d, 512],
        jnp.concatenate([x12, p12], axis=-1), activation, interpret=interpret)
    return jnp.concatenate([x3, x4], axis=-1)


# test hook: engage the fused path (interpret-mode kernels) off-TPU
FORCE = False


def enabled(activation, neighbors) -> bool:
    """Fused-path dispatch condition: precomputed neighbor chain + supported
    activation + TPU backend (or the FORCE test hook)."""
    return (neighbors is not None and supported(activation)
            and (on_tpu() or FORCE))


def supported(activation) -> bool:
    return _activation_name(activation) is not None
