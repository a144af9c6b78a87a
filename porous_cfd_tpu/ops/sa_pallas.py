"""Fused Pallas TPU kernel for SetAbstraction radius neighborhoods.

The measured round-2 bottleneck of the ++/PI-GANO model families
(BASELINE.md): the XLA SetAbstraction materializes every per-neighborhood
intermediate — messages ``[x_j || rel]`` and each MLP activation — as
(B, C, K, F) tensors in HBM (~100 MB each at the reference envelope), then
reads them back for the masked max and again for the backward. An ablation
showed the *gathers* are <7% of the cost; the traffic is the intermediates.

This kernel restructures the computation so nothing K-wide ever reaches HBM:

  * only the raw (B, C, K, F_in) feature gather (F_in is narrow: the SA
    inputs are coordinates/ids/pooled features, not hidden activations) and
    the (B, C, K, D) relative positions enter the kernel; the first layer's
    matmul happens in VMEM with the weight split into its feature block
    ``W0x`` and relative-position block ``W0r``;
  * inside the kernel each grid block processes ``G`` whole neighborhoods
    (G*K rows): adds the relative-position term ``rel @ W0r``, runs the
    remaining activated layers, and performs the masked max per
    neighborhood — all VMEM-resident; only the (B, C, F_out) result is
    written ("segmented fused MLP + masked-max pooling", the kernel scoped in
    BASELINE.md round 2);
  * the backward kernel recomputes the chain per block (no stored
    activations), routes each neighborhood's cotangent to its argmax row and
    accumulates the weight gradients across the grid.

Semantics match ``models/set_abstraction.SetAbstraction`` (reference
``models/modules.py:295-325``): empty neighborhoods yield 0; max-pool ties
route the cotangent to the first maximal row (XLA splits exact ties evenly —
measure-zero for continuous activations, same documented deviation as
ops/pointnet_pallas.py). Relative positions are treated as data (no position
cotangent) — valid for the boundary-cloud geometry branches, whose
coordinates are stop-gradient in the reference (pi_gano_pp.py:71-72) or
plain inputs; the all-points U-Net encoders keep the XLA path.
"""
from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from porous_cfd_tpu.ops.decoder_pallas import (_RULES, _activation_name, _dot,
                                               _dot_t, _outer, on_tpu)

NEG = float(jnp.finfo(jnp.float32).min)
supported = None  # set below


def _fwd_kernel(cfg, *refs):
    widths, act_name, g_block, k, nl = cfg
    rules = _RULES[act_name]
    it = iter(refs)
    xg_ref = next(it)
    rel_ref = next(it)
    mask_ref = next(it)
    w0x_ref = next(it)
    w0r_ref = next(it)
    b0_ref = next(it)
    ws = [next(it) for _ in range(nl - 1)]
    bs = [next(it) for _ in range(nl - 1)]
    out_ref = next(it)

    h = rules(_dot(xg_ref[0], w0x_ref[...]) + _dot(rel_ref[0], w0r_ref[...])
              + b0_ref[...])[0]
    for i in range(nl - 1):
        h = rules(_dot(h, ws[i][...]) + bs[i][...])[0]

    mask = mask_ref[0]                                   # (G, K)
    hm = h.reshape(g_block, k, h.shape[-1])
    m = jnp.max(jnp.where(mask[..., None] > 0, hm, NEG), axis=1)
    any_valid = jnp.sum(mask, axis=1, keepdims=True) > 0
    out_ref[0] = jnp.where(any_valid, m, 0.0)


def _bwd_kernel(cfg, *refs):
    widths, act_name, g_block, k, nl = cfg
    rules = _RULES[act_name]
    it = iter(refs)
    xg_ref = next(it)
    rel_ref = next(it)
    mask_ref = next(it)
    w0x_ref = next(it)
    w0r_ref = next(it)
    b0_ref = next(it)
    ws = [next(it) for _ in range(nl - 1)]
    bs = [next(it) for _ in range(nl - 1)]
    dout_ref = next(it)
    dxg_ref = next(it)
    dw0x_ref = next(it)
    dw0r_ref = next(it)
    db0_ref = next(it)
    dws = [next(it) for _ in range(nl - 1)]
    dbs = [next(it) for _ in range(nl - 1)]

    b, t = pl.program_id(0), pl.program_id(1)

    @pl.when(jnp.logical_and(b == 0, t == 0))
    def _init():
        dw0x_ref[...] = jnp.zeros_like(dw0x_ref)
        dw0r_ref[...] = jnp.zeros_like(dw0r_ref)
        db0_ref[...] = jnp.zeros_like(db0_ref)
        for r in dws + dbs:
            r[...] = jnp.zeros_like(r)

    # forward recompute, stashing pre-activations + layer inputs
    z0 = (_dot(xg_ref[0], w0x_ref[...]) + _dot(rel_ref[0], w0r_ref[...])
          + b0_ref[...])
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
    dxg_ref[0] = _dot_t(gz0, w0x_ref[...])
    dw0x_ref[...] += _outer(xg_ref[0], gz0)
    dw0r_ref[...] += _outer(rel_ref[0], gz0)
    db0_ref[...] += jnp.sum(gz0, axis=0, keepdims=True)


@lru_cache(maxsize=None)
def _build(widths, act_name, n_cases, n_cent, k, f_in, n_dims, g_block,
           interpret):
    nl = len(widths)
    f1, f_out = widths[0], widths[-1]
    grid = (n_cases, n_cent // g_block)
    cfg = (widths, act_name, g_block, k, nl)
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
            out_specs=[xg_spec, w0x_spec, w0r_spec, b0_spec]
            + w_specs + b_specs,
            out_shape=([jax.ShapeDtypeStruct(xg.shape, jnp.float32),
                        jax.ShapeDtypeStruct(w0x.shape, jnp.float32),
                        jax.ShapeDtypeStruct(w0r.shape, jnp.float32),
                        jax.ShapeDtypeStruct(b0.shape, jnp.float32)]
                       + [jax.ShapeDtypeStruct(w.shape, jnp.float32)
                          for w in ws]
                       + [jax.ShapeDtypeStruct(b.shape, jnp.float32)
                          for b in bs]),
            interpret=interpret,
        )(xg, rel, maskf, w0x, w0r, b0, *ws, *bs, dout)
        dxg, dw0x, dw0r, db0 = res[:4]
        return (dxg, jnp.zeros_like(rel), jnp.zeros_like(maskf), dw0x, dw0r,
                db0, tuple(res[4:4 + nl - 1]), tuple(res[3 + nl:]))

    fn.defvjp(fn_fwd, fn_bwd)
    return fn


def _gather(arr, idx):
    """arr (B, N, F), idx (B, ...) -> (B, ..., F)."""
    return jax.vmap(lambda a, i: a[i])(arr, idx)


def _pick_g(n_cent: int, k: int) -> int:
    """Neighborhoods per grid block: keep G*K rows around 512 and G*K a
    multiple of 8 (f32 sublanes); the centroid axis is padded to G."""
    g = max(1, 512 // k)
    while (g * k) % 8 != 0:
        g += 1
    return g


def sa_neighborhood(params: dict, mlp_layers, x, pos, pos_c, idx, mask,
                    r: float, activation, interpret: bool | None = None):
    """Fused SetAbstraction level: masked max over neighbors of
    ``MLP([x_j || (pos_j - pos_c)/r])``.

    :param params: ``conv_mlp`` parameter tree (``linear_i``: kernel/bias);
        layer 0's kernel rows split into the feature block ``W0x`` and the
        relative-position block ``W0r`` (both applied in-kernel).
    :param x: (B, N, F_in) source features; pos (B, N, D); pos_c (B, C, D).
    :param idx: (B, C, K) int32 neighbor indices; mask (B, C, K) validity.
    :return: (B, C, F_last) pooled features.
    """
    if interpret is None:
        interpret = not on_tpu()
    act = _activation_name(activation)
    nl = len(mlp_layers) - 1
    f_in = x.shape[-1]
    n_dims = pos.shape[-1]
    w0 = params["linear_0"]["kernel"].astype(jnp.float32)
    b0 = params["linear_0"]["bias"][None, :].astype(jnp.float32)
    ws = tuple(params[f"linear_{i}"]["kernel"].astype(jnp.float32)
               for i in range(1, nl))
    bs = tuple(params[f"linear_{i}"]["bias"][None, :].astype(jnp.float32)
               for i in range(1, nl))

    # only the narrow raw features + relative positions are gathered; every
    # K-wide MLP intermediate lives and dies in VMEM
    xg = _gather(x.astype(jnp.float32), idx)              # (B, C, K, F_in)
    rel = (_gather(pos.astype(jnp.float32), idx)
           - pos_c.astype(jnp.float32)[..., None, :]) / r

    b_cases, n_cent, k = idx.shape
    g_block = _pick_g(n_cent, k)
    pad = (-n_cent) % g_block
    maskf = mask.astype(jnp.float32)
    if pad:
        xg = jnp.pad(xg, ((0, 0), (0, pad), (0, 0), (0, 0)))
        rel = jnp.pad(rel, ((0, 0), (0, pad), (0, 0), (0, 0)))
        maskf = jnp.pad(maskf, ((0, 0), (0, pad), (0, 0)))
    cp = n_cent + pad

    fn = _build(tuple(mlp_layers[1:]), act, b_cases, cp, k, f_in, n_dims,
                g_block, interpret)
    out = fn(xg.reshape(b_cases, cp * k, -1), rel.reshape(b_cases, cp * k, -1),
             maskf, w0[:f_in], w0[f_in:], b0, ws, bs)
    return out[:, :n_cent] if pad else out


def sa_seq_fused(params: dict, fractions, radii, conv_mlp, max_neighbors: int,
                 activation, x, pos, neighbors, return_last_pos: bool = False,
                 interpret: bool | None = None):
    """Raw-params counterpart of ``SetAbstractionSeq`` (value path) routing
    every radius level through the fused kernel and a trailing
    GlobalSetAbstraction (when ``len(conv_mlp) > len(radii)``) through the
    fused pointnet kernel. ``neighbors`` is the precomputed chain from
    ``models.neighbors.sa_chain_precompute`` (required — the fused path is
    only engaged for static precomputed clouds).

    :return: (B, 1, F) pooled descriptor (and the last positions when
        ``return_last_pos``).
    """
    from porous_cfd_tpu.ops import pointnet_pallas

    for i, (r, layers) in enumerate(zip(radii, conv_mlp)):
        centroids, idx, mask = neighbors[i]
        pos_c = _gather(pos, centroids)
        x = sa_neighborhood(params[f"sa_{i}"]["conv_mlp"], layers, x, pos,
                            pos_c, idx, mask, r, activation,
                            interpret=interpret)
        pos = pos_c
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
        cent, idx, mask = nb
        pos_c = _gather(pp, cent)
        out = sa_neighborhood(params[key]["conv_mlp"], layers, xx, pp, pos_c,
                              idx, mask, r, activation, interpret=interpret)
        return out, pos_c

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


def supported(activation) -> bool:  # noqa: F811
    return _activation_name(activation) is not None
