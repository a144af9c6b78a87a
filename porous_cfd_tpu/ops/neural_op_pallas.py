"""Fused Pallas TPU kernel for the PI-GANO NeuralOperator trunk.

The trunk (models/pi_gano.py:_neural_ops_prop_ctx; reference
``NeuralOperatorSequential``, modules.py:248-274) is a stack of square dense
layers whose input is ``[points_embedding || geometry_embedding]`` and whose
every layer output is multiplied elementwise by the pooled branch embedding,
followed by a linear reduction to the output fields. Like the PIPN decoder
(ops/decoder_pallas.py), propagating (value, Jacobian, Hessian-diag) through
it in XLA materializes every (B, N, F) / (B, D, N, F) intermediate in HBM;
here the whole stack — context-split first layer, activation-derivative
rules, dropout, branch modulation, reduction — runs per point tile with all
intermediates VMEM-resident.

Structure shared with the decoder kernel (same helpers):
  * first-layer kernel split: the geometry block contributes a per-case
    constant ``ctx`` computed once in XLA; J/H skip its zero block;
  * J/H ride in the transposed (B, D, N, F) layout so the derivative
    component axis is a Pallas block dim;
  * backward recomputes the forward per tile (flash-attention style) and
    accumulates weight/bias/ctx gradients in revisited output blocks; the
    activation rules need third derivatives (closed forms in decoder_pallas).

New relative to the decoder kernel: the per-layer branch modulation. Its
backward needs the pre-modulation activations (stashed during recompute) and
accumulates the branch cotangent ``dpar`` per case — ``par`` multiplies v, J
and H at every layer, so all three streams contribute.

Dropout masks come from the in-kernel TPU PRNG seeded per (case, tile) from
the caller's JAX key: same distribution as the XLA path, different stream
(documented deviation, as for the decoder kernel). The boundary value-only
rows run as a second kernel on a disjoint seed stream.
"""
from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from porous_cfd_tpu.ops.decoder_pallas import (_RULES, _activation_name,
                                               _dot, _dot_t, _mask, _outer,
                                               _pad_pts, on_tpu)

TILE = 128  # the backward stashes only layer INPUTS + value pre-activations
            # (zj/zh and the pre-modulation triple are recomputed in the
            # reverse sweep), so the 352-wide trunk fits the ~16M VMEM budget
            # at the MXU-native 128-row tile (tile 64 ran the whole kernel at
            # half sublane utilization — measured 5.85 ms backward vs 3.4)
_BND_SEED_OFFSET = 0x5BD1E995


class _Cfg:
    def __init__(self, widths, activation, dropout, deterministic,
                 last_activation, out_features, with_derivatives, n_tiles,
                 n_cases):
        self.widths = tuple(widths)        # (L0, F, F, ..., F)
        self.n_ops = len(widths) - 1
        self.activation = activation
        self.dropout = tuple(dropout)
        self.deterministic = deterministic
        self.last_activation = last_activation
        self.out_features = out_features   # None = no fused reduction
        self.with_derivatives = with_derivatives
        self.n_tiles = n_tiles
        self.n_cases = n_cases

    @property
    def has_dropout(self):
        return (not self.deterministic
                and any(r > 0.0 for r in self.dropout))

    def activated(self, i):
        return i < self.n_ops - 1 or self.last_activation


def _io_refs(cfg, refs, want_grads):
    it = iter(refs)
    r = {"seed": next(it), "xv": next(it)}
    if cfg.with_derivatives:
        r["xj"], r["xh"] = next(it), next(it)
    r["ctx"], r["par"] = next(it), next(it)
    r["ws"] = [next(it) for _ in range(cfg.n_ops)]
    r["bs"] = [next(it) for _ in range(cfg.n_ops - 1)]
    if cfg.out_features is not None:
        r["wr"], r["br"] = next(it), next(it)
    if want_grads:
        r["gv"] = next(it)
        if cfg.with_derivatives:
            r["gj"], r["gh"] = next(it), next(it)
        r["dxv"] = next(it)
        if cfg.with_derivatives:
            r["dxj"], r["dxh"] = next(it), next(it)
        r["dctx"], r["dpar"] = next(it), next(it)
        r["dws"] = [next(it) for _ in range(cfg.n_ops)]
        r["dbs"] = [next(it) for _ in range(cfg.n_ops - 1)]
        if cfg.out_features is not None:
            r["dwr"], r["dbr"] = next(it), next(it)
    else:
        r["ov"] = next(it)
        if cfg.with_derivatives:
            r["oj"], r["oh"] = next(it), next(it)
    return r


def _fwd_kernel(cfg: _Cfg, *refs):
    rules = _RULES[cfg.activation]
    r = _io_refs(cfg, refs, want_grads=False)
    wd = cfg.with_derivatives

    if cfg.has_dropout:
        b, t = pl.program_id(0), pl.program_id(1)
        pltpu.prng_seed(r["seed"][0, 0] + b * cfg.n_tiles + t)

    par = r["par"][0]                    # (1, F)
    v = r["xv"][0]
    j = r["xj"][0] if wd else None
    h = r["xh"][0] if wd else None
    for i in range(cfg.n_ops):
        w = r["ws"][i][...]
        z = _dot(v, w) + (r["ctx"][0] if i == 0 else r["bs"][i - 1][...])
        if wd:
            zj, zh = _dot(j, w), _dot(h, w)
        if cfg.activated(i):
            val, d1, d2, _ = rules(z)
            v = val
            if wd:
                h = d2[None] * zj * zj + d1[None] * zh
                j = d1[None] * zj
        else:
            v = z
            if wd:
                j, h = zj, zh
        if cfg.dropout[i] > 0.0 and not cfg.deterministic:
            m = _mask(z.shape, cfg.dropout[i])
            v = v * m
            if wd:
                j, h = j * m[None], h * m[None]
        v = v * par
        if wd:
            j, h = j * par[None], h * par[None]
    if cfg.out_features is not None:
        wr = r["wr"][...]
        v = _dot(v, wr) + r["br"][...]
        if wd:
            j, h = _dot(j, wr), _dot(h, wr)
    r["ov"][0] = v
    if wd:
        r["oj"][0] = j
        r["oh"][0] = h


def _bwd_kernel(cfg: _Cfg, *refs):
    rules = _RULES[cfg.activation]
    r = _io_refs(cfg, refs, want_grads=True)
    wd = cfg.with_derivatives
    nl = cfg.n_ops

    b, t = pl.program_id(0), pl.program_id(1)
    if cfg.has_dropout:
        pltpu.prng_seed(r["seed"][0, 0] + b * cfg.n_tiles + t)

    @pl.when(jnp.logical_and(b == 0, t == 0))
    def _init_global():
        for ref in r["dws"] + r["dbs"]:
            ref[...] = jnp.zeros_like(ref)
        if cfg.out_features is not None:
            r["dwr"][...] = jnp.zeros_like(r["dwr"])
            r["dbr"][...] = jnp.zeros_like(r["dbr"])

    @pl.when(t == 0)
    def _init_case():
        r["dctx"][...] = jnp.zeros_like(r["dctx"])
        r["dpar"][...] = jnp.zeros_like(r["dpar"])

    par = r["par"][0]

    # ---- forward recompute --------------------------------------------------
    # Stash ONLY the dense-layer inputs and the value pre-activations (plus
    # the dropout masks, whose PRNG stream is order-dependent); zj/zh and the
    # pre-modulation triple are recomputed in the reverse sweep from the
    # stashed inputs. This costs 2D extra (tile, F) matmuls per layer but
    # cuts the per-layer stash from 15 to 6 (tile*F)-equivalents, which is
    # what lets the constant-width trunk run at tile 128.
    a = r["xv"][0]
    aj = r["xj"][0] if wd else None
    ah = r["xh"][0] if wd else None
    a_in, aj_in, ah_in = [], [], []       # dense-layer inputs
    zs, ms = [], {}
    for i in range(nl):
        w = r["ws"][i][...]
        a_in.append(a)
        aj_in.append(aj)
        ah_in.append(ah)
        z = _dot(a, w) + (r["ctx"][0] if i == 0 else r["bs"][i - 1][...])
        zj = _dot(aj, w) if wd else None
        zh = _dot(ah, w) if wd else None
        zs.append(z)
        if cfg.activated(i):
            val, d1, d2, _ = rules(z)
            a = val
            if wd:
                ah = d2[None] * zj * zj + d1[None] * zh
                aj = d1[None] * zj
        else:
            a = z
            if wd:
                aj, ah = zj, zh
        if cfg.dropout[i] > 0.0 and not cfg.deterministic:
            m = _mask(z.shape, cfg.dropout[i])
            ms[i] = m
            a = a * m
            if wd:
                aj, ah = aj * m[None], ah * m[None]
        a = a * par
        if wd:
            aj, ah = aj * par[None], ah * par[None]

    # ---- reverse sweep ------------------------------------------------------
    ga = r["gv"][0]
    gj = r["gj"][0] if wd else None
    gh = r["gh"][0] if wd else None
    if cfg.out_features is not None:
        wr = r["wr"][...]
        dwr = _outer(a, ga)
        if wd:
            dwr = dwr + _outer(aj, gj) + _outer(ah, gh)
        r["dwr"][...] += dwr
        r["dbr"][...] += jnp.sum(ga, axis=0, keepdims=True)
        ga = _dot_t(ga, wr)
        if wd:
            gj, gh = _dot_t(gj, wr), _dot_t(gh, wr)

    dpar = jnp.zeros_like(par)
    for i in range(nl - 1, -1, -1):
        # recompute this layer's zj/zh and pre-modulation triple from the
        # stashed inputs (see the stash note in the recompute loop above)
        w = r["ws"][i][...]
        zj = _dot(aj_in[i], w) if wd else None
        zh = _dot(ah_in[i], w) if wd else None
        if cfg.activated(i):
            pv_i, d1, d2, d3 = rules(zs[i])
            if wd:
                ph_i = d2[None] * zj * zj + d1[None] * zh
                pj_i = d1[None] * zj
        else:
            pv_i = zs[i]
            if wd:
                pj_i, ph_i = zj, zh
        if i in ms:
            m = ms[i]
            pv_i = pv_i * m
            if wd:
                pj_i, ph_i = pj_i * m[None], ph_i * m[None]

        # modulation backward: dpar from all three streams, then un-modulate
        dp = jnp.sum(ga * pv_i, axis=0, keepdims=True)
        if wd:
            dp = dp + jnp.sum(gj * pj_i, axis=(0, 1))[None]
            dp = dp + jnp.sum(gh * ph_i, axis=(0, 1))[None]
        dpar = dpar + dp
        ga = ga * par
        if wd:
            gj, gh = gj * par[None], gh * par[None]
        if i in ms:
            m = ms[i]
            ga = ga * m
            if wd:
                gj, gh = gj * m[None], gh * m[None]
        if cfg.activated(i):
            if wd:
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

        dw = _outer(a_in[i], gz)
        if wd:
            dw = dw + _outer(aj_in[i], gzj) + _outer(ah_in[i], gzh)
        r["dws"][i][...] += dw
        gb = jnp.sum(gz, axis=0, keepdims=True)
        if i == 0:
            r["dctx"][0] += gb
        else:
            r["dbs"][i - 1][...] += gb
        ga = _dot_t(gz, w)
        if wd:
            gj, gh = _dot_t(gzj, w), _dot_t(gzh, w)

    r["dpar"][0] += dpar
    r["dxv"][0] = ga
    if wd:
        r["dxj"][0] = gj
        r["dxh"][0] = gh


def _specs(cfg: _Cfg, d_dims, tile, want_grads):
    widths = cfg.widths
    l0, f = widths[0], widths[-1]
    nl = cfg.n_ops
    f_out = cfg.out_features if cfg.out_features is not None else f

    smem = pl.BlockSpec((1, 1), lambda b, t: (0, 0), memory_space=pltpu.SMEM)
    xv = pl.BlockSpec((1, tile, l0), lambda b, t: (b, t, 0))
    xjh = pl.BlockSpec((1, d_dims, tile, l0), lambda b, t: (b, 0, t, 0))
    case_vec = pl.BlockSpec((1, 1, f), lambda b, t: (b, 0, 0))
    wspecs = [pl.BlockSpec((widths[i], widths[i + 1]), lambda b, t: (0, 0))
              for i in range(nl)]
    bspecs = [pl.BlockSpec((1, widths[i + 1]), lambda b, t: (0, 0))
              for i in range(1, nl)]
    red = ([pl.BlockSpec((f, f_out), lambda b, t: (0, 0)),
            pl.BlockSpec((1, f_out), lambda b, t: (0, 0))]
           if cfg.out_features is not None else [])
    ov = pl.BlockSpec((1, tile, f_out), lambda b, t: (b, t, 0))
    ojh = pl.BlockSpec((1, d_dims, tile, f_out), lambda b, t: (b, 0, t, 0))

    deriv = [xjh, xjh] if cfg.with_derivatives else []
    oderiv = [ojh, ojh] if cfg.with_derivatives else []
    in_specs = [smem, xv] + deriv + [case_vec, case_vec] + wspecs + bspecs + red
    if not want_grads:
        return in_specs, [ov] + oderiv
    in_specs = in_specs + [ov] + oderiv
    out_specs = [xv] + deriv + [case_vec, case_vec] + wspecs + bspecs + red
    return in_specs, out_specs


@lru_cache(maxsize=None)
def _build(widths, activation, dropout, deterministic, last_activation,
           out_features, with_derivatives, d_dims, n_pts, n_cases, tile,
           interpret):
    n_tiles = n_pts // tile
    cfg = _Cfg(widths, activation, dropout, deterministic, last_activation,
               out_features, with_derivatives, n_tiles, n_cases)
    nl = cfg.n_ops
    f = widths[-1]
    f_out = out_features if out_features is not None else f
    grid = (n_cases, n_tiles)

    def flat(seed, xv, xj, xh, ctx, par, ws, bs, red):
        args = ([seed, xv] + ([xj, xh] if with_derivatives else [])
                + [ctx, par] + list(ws) + list(bs) + list(red))
        in_specs, out_specs = _specs(cfg, d_dims, tile, False)
        out_shape = [jax.ShapeDtypeStruct((n_cases, n_pts, f_out),
                                          jnp.float32)]
        if with_derivatives:
            out_shape += [jax.ShapeDtypeStruct(
                (n_cases, d_dims, n_pts, f_out), jnp.float32)] * 2
        res = pl.pallas_call(partial(_fwd_kernel, cfg), grid=grid,
                             in_specs=in_specs, out_specs=out_specs,
                             out_shape=out_shape, interpret=interpret)(*args)
        return res if with_derivatives else (res[0], None, None)

    @jax.custom_vjp
    def fn(seed, xv, xj, xh, ctx, par, ws, bs, red):
        return flat(seed, xv, xj, xh, ctx, par, ws, bs, red)

    def fn_fwd(seed, xv, xj, xh, ctx, par, ws, bs, red):
        return flat(seed, xv, xj, xh, ctx, par, ws, bs, red), \
            (seed, xv, xj, xh, ctx, par, ws, bs, red)

    def fn_bwd(saved, g):
        seed, xv, xj, xh, ctx, par, ws, bs, red = saved
        gv, gj, gh = g
        if gv is None:
            gv = jnp.zeros((n_cases, n_pts, f_out), jnp.float32)
        if with_derivatives:
            zero = jnp.zeros((n_cases, d_dims, n_pts, f_out), jnp.float32)
            gj = zero if gj is None else gj
            gh = zero if gh is None else gh
        args = ([seed, xv] + ([xj, xh] if with_derivatives else [])
                + [ctx, par] + list(ws) + list(bs) + list(red) + [gv]
                + ([gj, gh] if with_derivatives else []))
        in_specs, out_specs = _specs(cfg, d_dims, tile, True)
        out_shape = [jax.ShapeDtypeStruct(xv.shape, jnp.float32)]
        if with_derivatives:
            out_shape += [jax.ShapeDtypeStruct(xj.shape, jnp.float32)] * 2
        out_shape += [jax.ShapeDtypeStruct(ctx.shape, jnp.float32),
                      jax.ShapeDtypeStruct(par.shape, jnp.float32)]
        out_shape += [jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in ws]
        out_shape += [jax.ShapeDtypeStruct(b.shape, jnp.float32) for b in bs]
        out_shape += [jax.ShapeDtypeStruct(x.shape, jnp.float32) for x in red]
        res = pl.pallas_call(partial(_bwd_kernel, cfg), grid=grid,
                             in_specs=in_specs, out_specs=out_specs,
                             out_shape=out_shape, interpret=interpret)(*args)
        k = 0
        dxv = res[k]; k += 1
        dxj = dxh = None
        if with_derivatives:
            dxj, dxh = res[k], res[k + 1]; k += 2
        dctx, dpar = res[k], res[k + 1]; k += 2
        dws = tuple(res[k:k + nl]); k += nl
        dbs = tuple(res[k:k + nl - 1]); k += nl - 1
        dred = tuple(res[k:])
        return (None, dxv, dxj, dxh, dctx, dpar, dws, dbs, dred)

    fn.defvjp(fn_fwd, fn_bwd)
    return fn


def supported(activation) -> bool:
    return _activation_name(activation) is not None


def neural_ops_prop(params_prefix: dict, n_operators: int, n_local: int,
                    v, jt, ht, v_b, geom, par, activation,
                    dropout, last_activation: bool,
                    reduction_params: dict | None = None,
                    deterministic: bool = True, rng=None,
                    tile: int = TILE, interpret: bool | None = None):
    """Fused trunk propagation. Internal rows carry (v, J, H) in the
    transposed layout (``jt``/``ht``: (B, D, Ni, L)); boundary rows ``v_b``
    are value-only (may be None). ``geom`` (B, 1, G) and ``par`` (B, 1, F)
    are the pooled geometry/branch embeddings.

    Returns ``(v_merged (B, Ni+Nb, O), jac (B, Ni, O, D), lap same)`` in the
    engine convention, where O = reduction output width (or F without a
    fused reduction).
    """
    if interpret is None:
        interpret = not on_tpu()
    act = _activation_name(activation)
    f = par.shape[-1]
    widths = (v.shape[-1],) + (f,) * n_operators

    p0 = params_prefix["operator_0"]["Dense_0"]
    w0 = p0["kernel"]
    ctx = (geom[..., 0, :] @ w0[n_local:]
           + p0["bias"]).astype(jnp.float32)[:, None, :]
    ws = tuple([w0[:n_local].astype(jnp.float32)]
               + [params_prefix[f"operator_{i}"]["Dense_0"]["kernel"]
                  .astype(jnp.float32) for i in range(1, n_operators)])
    bs = tuple(params_prefix[f"operator_{i}"]["Dense_0"]["bias"][None, :]
               .astype(jnp.float32) for i in range(1, n_operators))
    red, out_features = (), None
    if reduction_params is not None:
        red = (reduction_params["kernel"].astype(jnp.float32),
               reduction_params["bias"][None, :].astype(jnp.float32))
        out_features = red[0].shape[-1]

    b_cases, n_int = v.shape[-3], v.shape[-2]
    d_dims = jt.shape[-3]
    drop = tuple(float(r) for r in dropout)
    if rng is None:
        deterministic = True
    seed = (jax.random.bits(rng, dtype=jnp.uint32).astype(jnp.int32)
            if (not deterministic and rng is not None)
            else jnp.zeros((), jnp.int32)).reshape(1, 1)

    par32 = par.astype(jnp.float32)
    vp = _pad_pts(v.astype(jnp.float32), 1, tile)
    jp = _pad_pts(jt.astype(jnp.float32), 2, tile)
    hp = _pad_pts(ht.astype(jnp.float32), 2, tile)
    fn_int = _build(widths, act, drop, deterministic, last_activation,
                    out_features, True, d_dims, vp.shape[1], b_cases, tile,
                    interpret)
    ov, oj, oh = fn_int(seed, vp, jp, hp, ctx, par32, ws, bs, red)
    ov = ov[:, :n_int]
    oj = jnp.transpose(oj[:, :, :n_int], (0, 2, 3, 1))
    oh = jnp.transpose(oh[:, :, :n_int], (0, 2, 3, 1))

    if v_b is not None:
        vbp = _pad_pts(v_b.astype(jnp.float32), 1, tile)
        fn_bnd = _build(widths, act, drop, deterministic, last_activation,
                        out_features, False, d_dims, vbp.shape[1], b_cases,
                        tile, interpret)
        ovb, _, _ = fn_bnd(seed + _BND_SEED_OFFSET, vbp, None, None, ctx,
                           par32, ws, bs, red)
        ov = jnp.concatenate([ov, ovb[:, :v_b.shape[-2]]], axis=-2)
    return ov, oj, oh
