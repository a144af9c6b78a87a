"""Fused Pallas TPU kernel for the (value, Jacobian, Hessian-diag) decoder.

The PINN training step is HBM-bandwidth-bound, not FLOP-bound: the analytic
derivative propagation (physics/analytic.py) keeps J/H tensors of shape
(B, N, D, F) live between layers, and XLA materializes every layer's (v, J, H)
triple plus most elementwise intermediates in HBM (~15 GB accessed per step at
the reference envelope vs ~0.5 GB of essential input/output traffic).

This kernel runs the ENTIRE decoder stack — dense layers, activation
derivative rules, dropout — inside one Pallas program per point tile, with
weights and all layer intermediates VMEM-resident. HBM traffic collapses to:
read the (64-wide) local features once, write the (3-wide) outputs once.

Backward is a second kernel (custom_vjp) that recomputes the forward per tile
(flash-attention style) and accumulates weight gradients in revisited output
blocks across the sequential TPU grid. The activation rules need the THIRD
derivative in backward (the Hessian path h' = s''(z)·j² + s'(z)·h is itself
differentiated w.r.t. z); closed forms for tanh/silu below.

Semantics match ``analytic.decoder_prop`` exactly in deterministic mode
(modulo float reassociation); under dropout the masks come from the TPU PRNG
(seeded from the caller's JAX key) instead of ``jax.random`` — same
distribution, different stream.

Layout notes: J/H ride as (B, D, N, F) so the derivative component axis is a
leading block dim — activation rules then broadcast d1/d2 over it with no
in-kernel repeats/reshapes; the point axis is tiled in 128-row blocks
(f32 sublane-aligned), padded with zero rows (zero cotangents => padded rows
contribute nothing to weight gradients).
"""
from __future__ import annotations

import os
from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 128
_BND_SEED_OFFSET = 0x5BD1E995  # disjoint dropout stream for the value kernel


def _silu_rules3(z):
    s = jax.nn.sigmoid(z)
    s1 = s * (1.0 - s)
    s2 = s1 * (1.0 - 2.0 * s)
    s3 = s2 * (1.0 - 2.0 * s) - 2.0 * s1 * s1
    return z * s, s + z * s1, 2.0 * s1 + z * s2, 3.0 * s2 + z * s3


def _tanh_rules3(z):
    t = jnp.tanh(z)
    d1 = 1.0 - t * t
    d2 = -2.0 * t * d1
    d3 = -2.0 * d1 * d1 - 2.0 * t * d2
    return t, d1, d2, d3


_RULES = {"silu": _silu_rules3, "tanh": _tanh_rules3}


def _rows(a):
    """Collapse leading axes into rows (Mosaic's matmul is strictly 2D with a
    single contracting dim; leading-dim merges keep the lane axis intact)."""
    return a.reshape(-1, a.shape[-1]) if a.ndim > 2 else a


# In-kernel matmul input precision. With f32 inputs Mosaic runs true-f32
# multi-pass MXU matmuls; casting the operands to bf16 (f32 accumulation
# kept) uses the MXU's native rate — the same bf16-pass precision XLA's
# DEFAULT matmul mode applies to the rest of the compute graph, so the
# kernels are not the odd ones out. Opt out with PCT_KERNEL_BF16=0 (the
# golden-duct accuracy benchmark guards this knob, CONVERGENCE.md).
_BF16_INPUTS = os.environ.get("PCT_KERNEL_BF16", "1") != "0"


def _mm(a, b, dims):
    # TPU-only: interpret-mode parity tests stay exact f32. On the bf16
    # branch the precision is pinned to DEFAULT so a global
    # jax_default_matmul_precision override (e.g. 'highest' in on-TPU test
    # sessions, PCT_TEST_TPU=1) cannot ask Mosaic for an fp32-precision
    # contraction over deliberately-bf16 operands, which fails to lower; the
    # f32 branch inherits the global precision so parity comparisons see the
    # same matmul mode on both sides.
    if _BF16_INPUTS and on_tpu():
        a = a.astype(jnp.bfloat16)
        b = b.astype(jnp.bfloat16)
        return jax.lax.dot_general(a, b, dims,
                                   precision=jax.lax.Precision.DEFAULT,
                                   preferred_element_type=jnp.float32)
    return jax.lax.dot_general(a, b, dims,
                               preferred_element_type=jnp.float32)


def _dot(a, b):
    """(..., K) @ (K, N) on the MXU with f32 accumulation."""
    out = _mm(_rows(a), b, (((1,), (0,)), ((), ())))
    return out.reshape(*a.shape[:-1], b.shape[-1])


def _dot_t(g, w):
    """(..., F) @ (K, F)^T -> (..., K)."""
    out = _mm(_rows(g), w, (((1,), (1,)), ((), ())))
    return out.reshape(*g.shape[:-1], w.shape[0])


def _outer(a, g):
    """Weight-gradient contraction: sum over all leading (row) axes."""
    return _mm(_rows(a), _rows(g), (((0,), (0,)), ((), ())))


def _mask(shape, rate):
    """Inverted-dropout mask from the in-kernel PRNG (seeded by caller).

    ``prng_random_bits`` yields int32 on TPU: the keep-threshold compare MUST
    happen in uint32 — a signed compare wraps the threshold negative and
    silently turns e.g. rate 0.05 into ~55% dropped (rate 0.5 into 100%).
    Caught by the on-device mask-statistics test
    (tests/test_decoder_pallas.py::test_dropout_statistics...)."""
    keep = 1.0 - rate
    bits = pltpu.prng_random_bits(shape)
    if bits.dtype != jnp.uint32:
        bits = pltpu.bitcast(bits, jnp.uint32)
    thresh = jnp.uint32(min(2 ** 32 - 1, int(keep * 2 ** 32)))
    return jnp.where(bits < thresh, jnp.float32(1.0 / keep), jnp.float32(0.0))


class _Config:
    """Static kernel configuration (hashable closure payload).

    ``ctx_width`` > 0 enables the max-pool-coupled mode: the J/H inputs carry
    ``L0 + ctx_width`` channels (local block + pooled-context block, the
    latter nonzero only at argmax-winner rows) and the first layer's kernel
    ref is the FULL (L0 + ctx_width, F1) matrix — the value rows use its
    local slice + the per-case ctx vector, the derivative rows use all of it.
    """

    def __init__(self, widths, activation, dropout, deterministic,
                 with_derivatives, n_tiles, n_cases, ctx_width=0,
                 with_j0_add=False):
        self.widths = tuple(widths)          # (L0, F1, ..., FL)
        self.n_layers = len(widths) - 1
        self.activation = activation
        self.dropout = tuple(dropout or (0.0,) * self.n_layers)
        self.deterministic = deterministic
        self.with_derivatives = with_derivatives
        self.n_tiles = n_tiles
        self.n_cases = n_cases
        self.ctx_width = ctx_width
        # additive layer-0 J/H terms (B, D, N, F1): the max-pool-coupled
        # contribution precontracted with the context kernel block outside
        # the kernel (winner-gather path, models/pipn.py)
        self.with_j0_add = with_j0_add

    @property
    def has_dropout(self):
        return (not self.deterministic
                and any(r > 0.0 for r in self.dropout[:self.n_layers - 1]))


# ---------------------------------------------------------------------------
# forward kernels


def _fwd_kernel(cfg: _Config, *refs):
    """refs: seed, xv, [xj, xh,] ctx, W0, W1, b1, ..., -> ov, [oj, oh]."""
    rules = _RULES[cfg.activation]
    nl = cfg.n_layers
    it = iter(refs)
    seed_ref = next(it)
    xv_ref = next(it)
    if cfg.with_derivatives:
        xj_ref, xh_ref = next(it), next(it)
        if cfg.with_j0_add:
            ja_ref, ha_ref = next(it), next(it)
    ctx_ref = next(it)
    ws = [next(it) for _ in range(nl)]
    bs = [next(it) for _ in range(nl - 1)]
    ov_ref = next(it)
    if cfg.with_derivatives:
        oj_ref, oh_ref = next(it), next(it)

    if cfg.has_dropout:
        b, t = pl.program_id(0), pl.program_id(1)
        pltpu.prng_seed(seed_ref[0, 0] + b * cfg.n_tiles + t)

    v = xv_ref[0]                       # (T, L0)
    j = xj_ref[0] if cfg.with_derivatives else None   # (D, T, L0[+G])
    h = xh_ref[0] if cfg.with_derivatives else None
    for i in range(nl):
        w = ws[i][...]
        wv = w[:cfg.widths[0]] if (i == 0 and cfg.ctx_width) else w
        z = _dot(v, wv) + (ctx_ref[0] if i == 0 else bs[i - 1][...])
        if cfg.with_derivatives:
            zj, zh = _dot(j, w), _dot(h, w)
            if i == 0 and cfg.with_j0_add:
                zj = zj + ja_ref[0].astype(jnp.float32)
                zh = zh + ha_ref[0].astype(jnp.float32)
        if i < nl - 1:
            val, d1, d2, _ = rules(z)
            v = val
            if cfg.with_derivatives:
                h = d2[None] * zj * zj + d1[None] * zh
                j = d1[None] * zj
            if cfg.dropout[i] > 0.0 and not cfg.deterministic:
                m = _mask(z.shape, cfg.dropout[i])
                v = v * m
                if cfg.with_derivatives:
                    j, h = j * m[None], h * m[None]
        else:
            v = z
            if cfg.with_derivatives:
                j, h = zj, zh
    ov_ref[0] = v
    if cfg.with_derivatives:
        oj_ref[0] = j
        oh_ref[0] = h


# ---------------------------------------------------------------------------
# backward kernel: recompute forward per tile, chain cotangents, accumulate
# weight/bias/ctx gradients in revisited output blocks


def _bwd_kernel(cfg: _Config, *refs):
    rules = _RULES[cfg.activation]
    nl = cfg.n_layers
    wd = cfg.with_derivatives
    it = iter(refs)
    seed_ref = next(it)
    xv_ref = next(it)
    if wd:
        xj_ref, xh_ref = next(it), next(it)
        if cfg.with_j0_add:
            ja_ref, ha_ref = next(it), next(it)
    ctx_ref = next(it)
    ws = [next(it) for _ in range(nl)]
    bs = [next(it) for _ in range(nl - 1)]
    gv_ref = next(it)
    if wd:
        gj_ref, gh_ref = next(it), next(it)
    # outputs
    dxv_ref = next(it)
    if wd:
        dxj_ref, dxh_ref = next(it), next(it)
        if cfg.with_j0_add:
            dja_ref, dha_ref = next(it), next(it)
    dctx_ref = next(it)
    dws = [next(it) for _ in range(nl)]
    dbs = [next(it) for _ in range(nl - 1)]

    b, t = pl.program_id(0), pl.program_id(1)
    if cfg.has_dropout:
        pltpu.prng_seed(seed_ref[0, 0] + b * cfg.n_tiles + t)

    @pl.when(jnp.logical_and(b == 0, t == 0))
    def _init_global():
        for r in dws + dbs:
            r[...] = jnp.zeros_like(r)

    @pl.when(t == 0)
    def _init_case():
        dctx_ref[...] = jnp.zeros_like(dctx_ref)

    # ---- forward recompute, stashing pre-activations (and masks) ----------
    a = xv_ref[0]
    aj = xj_ref[0] if wd else None
    ah = xh_ref[0] if wd else None
    a_in, aj_in, ah_in = [], [], []     # inputs of each layer
    zs, zjs, zhs, ms = [], [], [], {}
    for i in range(nl):
        w = ws[i][...]
        wv = w[:cfg.widths[0]] if (i == 0 and cfg.ctx_width) else w
        a_in.append(a)
        aj_in.append(aj)
        ah_in.append(ah)
        z = _dot(a, wv) + (ctx_ref[0] if i == 0 else bs[i - 1][...])
        zj = _dot(aj, w) if wd else None
        zh = _dot(ah, w) if wd else None
        if wd and i == 0 and cfg.with_j0_add:
            zj = zj + ja_ref[0].astype(jnp.float32)
            zh = zh + ha_ref[0].astype(jnp.float32)
        zs.append(z)
        zjs.append(zj)
        zhs.append(zh)
        if i < nl - 1:
            val, d1, d2, _ = rules(z)
            a = val
            if wd:
                ah = d2[None] * zj * zj + d1[None] * zh
                aj = d1[None] * zj
            if cfg.dropout[i] > 0.0 and not cfg.deterministic:
                m = _mask(z.shape, cfg.dropout[i])
                ms[i] = m
                a = a * m
                if wd:
                    aj, ah = aj * m[None], ah * m[None]
        else:
            a = z
            if wd:
                aj, ah = zj, zh

    # ---- reverse sweep -----------------------------------------------------
    ga = gv_ref[0]
    gj = gj_ref[0] if wd else None
    gh = gh_ref[0] if wd else None
    for i in range(nl - 1, -1, -1):
        if i < nl - 1:
            if i in ms:
                m = ms[i]
                ga = ga * m
                if wd:
                    gj, gh = gj * m[None], gh * m[None]
            _, d1, d2, d3 = rules(zs[i])
            if wd:
                zj, zh = zjs[i], zhs[i]
                gz = (ga * d1
                      + jnp.sum(gj * zj * d2[None]
                                + gh * (zj * zj * d3[None] + zh * d2[None]),
                                axis=0))
                gzj = gj * d1[None] + gh * (2.0 * zj) * d2[None]
                gzh = gh * d1[None]
            else:
                gz = ga * d1
        else:
            gz = ga
            if wd:
                gzj, gzh = gj, gh

        w = ws[i][...]
        coupled0 = i == 0 and cfg.ctx_width
        wv = w[:cfg.widths[0]] if coupled0 else w
        if coupled0:
            # value rows touch only the local block of the full first-layer
            # kernel; J/H rows touch all of it (zero-pad the value part —
            # Mosaic has no scatter-add)
            dw_v = _outer(a_in[i], gz)
            dw = (_outer(aj_in[i], gzj) + _outer(ah_in[i], gzh)
                  + jnp.concatenate(
                      [dw_v, jnp.zeros((cfg.ctx_width, dw_v.shape[-1]),
                                       dw_v.dtype)], axis=0))
        else:
            dw = _outer(a_in[i], gz)
            if wd:
                dw = dw + _outer(aj_in[i], gzj) + _outer(ah_in[i], gzh)
        dws[i][...] += dw
        gb = jnp.sum(gz, axis=0, keepdims=True)
        if i == 0:
            dctx_ref[0] += gb
        else:
            dbs[i - 1][...] += gb
        if wd and i == 0 and cfg.with_j0_add:
            dja_ref[0] = gzj.astype(dja_ref.dtype)
            dha_ref[0] = gzh.astype(dha_ref.dtype)
        ga = _dot_t(gz, wv)
        if wd:
            gj, gh = _dot_t(gzj, w), _dot_t(gzh, w)

    dxv_ref[0] = ga
    if wd:
        dxj_ref[0] = gj
        dxh_ref[0] = gh


# ---------------------------------------------------------------------------
# pallas_call plumbing


def _specs(cfg: _Config, d_dims, tile, f_last, want_grads):
    """(in_specs, out_specs, out_shapes) for fwd (want_grads=False) or bwd."""
    widths = cfg.widths
    l0, f1 = widths[0], widths[1]
    nl = cfg.n_layers

    smem = pl.BlockSpec((1, 1), lambda b, t: (0, 0),
                        memory_space=pltpu.SMEM)
    xv = pl.BlockSpec((1, tile, l0), lambda b, t: (b, t, 0))
    xjh = pl.BlockSpec((1, d_dims, tile, l0 + cfg.ctx_width),
                       lambda b, t: (b, 0, t, 0))
    ctx = pl.BlockSpec((1, 1, f1), lambda b, t: (b, 0, 0))
    wspecs = [pl.BlockSpec((widths[i] + (cfg.ctx_width if i == 0 else 0),
                            widths[i + 1]), lambda b, t: (0, 0))
              for i in range(nl)]
    bspecs = [pl.BlockSpec((1, widths[i + 1]), lambda b, t: (0, 0))
              for i in range(1, nl)]
    ov = pl.BlockSpec((1, tile, f_last), lambda b, t: (b, t, 0))
    ojh = pl.BlockSpec((1, d_dims, tile, f_last), lambda b, t: (b, 0, t, 0))
    j0a = pl.BlockSpec((1, d_dims, tile, f1), lambda b, t: (b, 0, t, 0))

    deriv_in = ([xjh, xjh] + ([j0a, j0a] if cfg.with_j0_add else [])
                if cfg.with_derivatives else [])
    in_specs = [smem, xv] + deriv_in + [ctx] + wspecs + bspecs
    if not want_grads:
        out_specs = [ov] + ([ojh, ojh] if cfg.with_derivatives else [])
        return in_specs, out_specs
    # bwd: inputs additionally carry the output cotangents; outputs are input
    # cotangents + revisited gradient accumulators
    in_specs = in_specs + [ov] + ([ojh, ojh] if cfg.with_derivatives else [])
    out_specs = [xv] + deriv_in + [ctx] + wspecs + bspecs
    return in_specs, out_specs


@lru_cache(maxsize=None)
def _build(widths, activation, dropout, deterministic, with_derivatives,
           d_dims, n_pts, n_cases, tile, interpret, ctx_width=0,
           with_j0_add=False):
    """Compile-cached fused decoder for one static configuration.

    Returns fn(seed, xv, xj, xh, ctx, ws, bs) -> (v, j, h) with custom VJP
    (xj/xh/j/h are None when with_derivatives=False).
    """
    n_tiles = n_pts // tile
    cfg = _Config(widths, activation, dropout, deterministic,
                  with_derivatives, n_tiles, n_cases, ctx_width, with_j0_add)
    nl = cfg.n_layers
    f_last = widths[-1]
    grid = (n_cases, n_tiles)

    def flat(seed, xv, xj, xh, ja, ha, ctx, ws, bs):
        args = ([seed, xv]
                + ([xj, xh] + ([ja, ha] if with_j0_add else [])
                   if with_derivatives else [])
                + [ctx] + list(ws) + list(bs))
        in_specs, out_specs = _specs(cfg, d_dims, tile, f_last, False)
        out_shape = [jax.ShapeDtypeStruct((n_cases, n_pts, f_last),
                                          jnp.float32)]
        if with_derivatives:
            out_shape += [jax.ShapeDtypeStruct(
                (n_cases, d_dims, n_pts, f_last), jnp.float32)] * 2
        res = pl.pallas_call(
            partial(_fwd_kernel, cfg),
            grid=grid, in_specs=in_specs, out_specs=out_specs,
            out_shape=out_shape, interpret=interpret,
        )(*args)
        return res if with_derivatives else (res[0], None, None)

    @jax.custom_vjp
    def fn(seed, xv, xj, xh, ja, ha, ctx, ws, bs):
        return flat(seed, xv, xj, xh, ja, ha, ctx, ws, bs)

    def fn_fwd(seed, xv, xj, xh, ja, ha, ctx, ws, bs):
        return flat(seed, xv, xj, xh, ja, ha, ctx, ws, bs), \
            (seed, xv, xj, xh, ja, ha, ctx, ws, bs)

    def fn_bwd(saved, g):
        seed, xv, xj, xh, ja, ha, ctx, ws, bs = saved
        gv, gj, gh = g
        if gv is None:
            gv = jnp.zeros((n_cases, n_pts, f_last), jnp.float32)
        if with_derivatives:
            zero_jh = jnp.zeros((n_cases, d_dims, n_pts, f_last), jnp.float32)
            gj = zero_jh if gj is None else gj
            gh = zero_jh if gh is None else gh
        args = ([seed, xv]
                + ([xj, xh] + ([ja, ha] if with_j0_add else [])
                   if with_derivatives else [])
                + [ctx] + list(ws) + list(bs) + [gv]
                + ([gj, gh] if with_derivatives else []))
        in_specs, out_specs = _specs(cfg, d_dims, tile, f_last, True)
        out_shape = [jax.ShapeDtypeStruct(xv.shape, jnp.float32)]
        if with_derivatives:
            out_shape += [jax.ShapeDtypeStruct(xj.shape, jnp.float32)] * 2
            if with_j0_add:
                # cotangent dtype follows the (possibly bf16) primal streams
                out_shape += [jax.ShapeDtypeStruct(ja.shape, ja.dtype),
                              jax.ShapeDtypeStruct(ha.shape, ha.dtype)]
        out_shape += [jax.ShapeDtypeStruct(ctx.shape, jnp.float32)]
        out_shape += [jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in ws]
        out_shape += [jax.ShapeDtypeStruct(b.shape, jnp.float32) for b in bs]
        res = pl.pallas_call(
            partial(_bwd_kernel, cfg),
            grid=grid, in_specs=in_specs, out_specs=out_specs,
            out_shape=out_shape, interpret=interpret,
        )(*args)
        k = 0
        dxv = res[k]; k += 1
        dxj = dxh = dja = dha = None
        if with_derivatives:
            dxj, dxh = res[k], res[k + 1]; k += 2
            if with_j0_add:
                dja, dha = res[k], res[k + 1]; k += 2
        dctx = res[k]; k += 1
        dws = tuple(res[k:k + nl]); k += nl
        dbs = tuple(res[k:k + nl - 1])
        return (None, dxv, dxj, dxh, dja, dha, dctx, dws, dbs)

    fn.defvjp(fn_fwd, fn_bwd)
    return fn


# ---------------------------------------------------------------------------
# public entry


def _activation_name(activation) -> str | None:
    import flax.linen as nn
    if activation in (nn.silu, jax.nn.silu):
        return "silu"
    if activation in (nn.tanh, jnp.tanh):
        return "tanh"
    return None


def supported(activation, layers=None) -> bool:
    """Whether the fused kernel covers this decoder configuration."""
    return _activation_name(activation) is not None


def on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover
        return False


def _pad_pts(x, axis, mult):
    n = x.shape[axis]
    pad = (-n) % mult
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def decoder_prop(params: dict, layers, n_local: int, v, jt, ht, v_b, g,
                 activation, dropout=None, last_activation: bool = False,
                 deterministic: bool = True, rng=None,
                 tile: int | None = None, interpret: bool | None = None,
                 jctx_t=None, hctx_t=None, j0_add=None, h0_add=None,
                 j0_dtype=None):
    """Fused-kernel decoder propagation (internal (v,J,H) tiles + boundary
    value tiles).

    Transposed derivative convention: ``jt``/``ht`` arrive as (B, D, Ni, L)
    (``analytic.mlp_prop_t`` emits this natively) — the component axis is a
    Pallas block dim, so the kernel consumes them with NO layout copies.
    Returns ``(v_merged (B, Ni+Nb, O), jac (B, Ni, O, D), lap (B, Ni, O, D))``
    — directly in the engine's convention (one transpose on the tiny outputs).

    ``jctx_t``/``hctx_t`` (B, D, Ni, G) enable the max-pool-coupled mode
    (see _Config): they are concatenated onto the J/H inputs and flow through
    the context block of the full first-layer kernel, yielding the TRUE
    per-point derivatives including the pooled-feature argmax coupling
    (models/pipn.py). The point tile is halved in this mode to keep the
    wider stashes VMEM-resident.

    ``last_activation`` must be False (the only mode the decoders use).
    """
    assert not last_activation, "fused decoder is last_activation=False only"
    if interpret is None:
        interpret = not on_tpu()
    act = _activation_name(activation)
    nl = len(layers) - 1
    widths = (n_local,) + tuple(layers[1:])
    coupled = jctx_t is not None
    with_j0_add = j0_add is not None
    assert not (coupled and with_j0_add)
    ctx_width = layers[0] - n_local if coupled else 0
    if tile is None:
        tile = TILE // 2 if coupled else TILE

    # first-layer split: per-case context contribution (tiny, stays in XLA —
    # its gradient flows through dctx)
    p0 = params["linear_0"]
    w0 = p0["kernel"]
    ctx = (g[..., 0, :] @ w0[n_local:] + p0["bias"]).astype(jnp.float32)[:, None, :]
    w0_first = (w0 if coupled else w0[:n_local]).astype(jnp.float32)
    ws = tuple([w0_first]
               + [params[f"linear_{i}"]["kernel"].astype(jnp.float32)
                  for i in range(1, nl)])
    bs = tuple(params[f"linear_{i}"]["bias"][None, :].astype(jnp.float32)
               for i in range(1, nl))

    b_cases, n_int = v.shape[-3], v.shape[-2]
    d_dims = jt.shape[-3]
    n_bnd = v_b.shape[-2] if v_b is not None else 0
    drop = tuple(float(r) for r in (dropout or (0.0,) * nl))
    assert drop[nl - 1] == 0.0, "fused decoder: no dropout on the final layer"
    if rng is None:
        deterministic = True
    seed = (jax.random.bits(rng, dtype=jnp.uint32).astype(jnp.int32)
            if (not deterministic and rng is not None)
            else jnp.zeros((), jnp.int32)).reshape(1, 1)

    # internal rows: (v, J, H) kernel over the native (B, D, N, L) layout
    if coupled:
        jt = jnp.concatenate([jt, jctx_t], axis=-1)
        ht = jnp.concatenate([ht, hctx_t], axis=-1)
    jp = _pad_pts(jt.astype(jnp.float32), 2, tile)
    hp = _pad_pts(ht.astype(jnp.float32), 2, tile)
    vp = _pad_pts(v.astype(jnp.float32), 1, tile)
    jap = hap = None
    if with_j0_add:
        # The add terms are the kernel's largest streams ((B, D, N, F1) each;
        # ~80 MB at the reference envelope). Under the bf16 kernel mode they
        # are stored/streamed as bf16 — the same precision class as the bf16
        # matmul passes that consume them (accumulation stays f32 in-kernel).
        # ``j0_dtype`` overrides the inference so parity tests can force the
        # bf16 stream (and its bf16 dja/dha cotangents) off-TPU (ADVICE r4).
        j0_dt = j0_dtype if j0_dtype is not None else (
            jnp.bfloat16 if (_BF16_INPUTS and not interpret)
            else jnp.float32)
        jap = _pad_pts(j0_add.astype(j0_dt), 2, tile)
        hap = _pad_pts(h0_add.astype(j0_dt), 2, tile)
    fn_int = _build(widths, act, drop, deterministic, True, d_dims,
                    vp.shape[1], b_cases, tile, interpret, ctx_width,
                    with_j0_add)
    ov, oj, oh = fn_int(seed, vp, jp, hp, jap, hap, ctx, ws, bs)
    ov = ov[:, :n_int]
    # (B, D, Ni, O) -> engine convention (B, Ni, O, D) in one permutation
    oj = jnp.transpose(oj[:, :, :n_int], (0, 2, 3, 1))
    oh = jnp.transpose(oh[:, :, :n_int], (0, 2, 3, 1))

    if v_b is not None:
        vbp = _pad_pts(v_b.astype(jnp.float32), 1, tile)
        fn_bnd = _build(widths, act, drop, deterministic, False, d_dims,
                        vbp.shape[1], b_cases, tile, interpret)
        ws_bnd = (w0_first[:n_local], *ws[1:]) if coupled else ws
        ovb, _, _ = fn_bnd(seed + _BND_SEED_OFFSET, vbp, None, None, None,
                           None, ctx, ws_bnd, bs)
        ov = jnp.concatenate([ov, ovb[:, :n_bnd]], axis=-2)
    return ov, oj, oh
