"""Fused Pallas TPU kernel for PointNet-style global feature extraction:
value MLP (every layer activated) followed by a max-pool over the point axis.

Used by the PIPN feature extractor (modules.py:56-82 semantics), the PI-GANO
geometry encoder and the branch net — all share the shape
``act(...act(x @ W1 + b1)... @ Wn + bn) -> max over points``.

Motivation matches ops/decoder_pallas.py: the XLA version writes the
(B, N, 1024) last-layer activation to HBM, reads it back for the pool, and
the backward re-materializes it again — ~0.6 GB of traffic per step at the
reference envelope for a result that is only (B, 1024). Here each point tile
flows through the whole chain in VMEM and only the running (max, argmax)
pair (B, 1, F) is ever written; the backward kernel recomputes the chain per
tile and routes the pooled cotangent to the stored argmax rows.

Tie semantics: the cotangent goes to the FIRST maximal row (running argmax),
whereas XLA's reduce-max VJP splits it evenly among exact ties — for
continuous activations ties are measure-zero; documented deviation.
"""
from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from porous_cfd_tpu.ops.decoder_pallas import (_RULES, _dot, _dot_t, _outer,
                                               _activation_name, _pad_pts,
                                               on_tpu)

TILE = 256
NEG = float(jnp.finfo(jnp.float32).min)


def _fwd_kernel(cfg, *refs):
    widths, act_name, n_valid, tile, nl = cfg
    rules = _RULES[act_name]
    it = iter(refs)
    x_ref = next(it)
    ws = [next(it) for _ in range(nl)]
    bs = [next(it) for _ in range(nl)]
    m_ref = next(it)
    a_ref = next(it)

    t = pl.program_id(1)
    v = x_ref[0]
    for i in range(nl):
        v = rules(_dot(v, ws[i][...]) + bs[i][...])[0]

    rows = jax.lax.broadcasted_iota(jnp.int32, v.shape, 0) + t * tile
    v = jnp.where(rows < n_valid, v, NEG)
    tile_max = jnp.max(v, axis=0, keepdims=True)
    tile_arg = (jnp.argmax(v, axis=0, keepdims=True).astype(jnp.int32)
                + t * tile)

    @pl.when(t == 0)
    def _first():
        m_ref[0] = tile_max
        a_ref[0] = tile_arg

    @pl.when(t > 0)
    def _rest():
        better = tile_max > m_ref[0]
        a_ref[0] = jnp.where(better, tile_arg, a_ref[0])
        m_ref[0] = jnp.maximum(tile_max, m_ref[0])


def _bwd_kernel(cfg, *refs):
    widths, act_name, n_valid, tile, nl = cfg
    rules = _RULES[act_name]
    it = iter(refs)
    x_ref = next(it)
    ws = [next(it) for _ in range(nl)]
    bs = [next(it) for _ in range(nl)]
    a_ref = next(it)
    dm_ref = next(it)
    dx_ref = next(it)
    dws = [next(it) for _ in range(nl)]
    dbs = [next(it) for _ in range(nl)]

    b, t = pl.program_id(0), pl.program_id(1)

    @pl.when(jnp.logical_and(b == 0, t == 0))
    def _init():
        for r in dws + dbs:
            r[...] = jnp.zeros_like(r)

    # forward recompute, stashing pre-activations
    a = x_ref[0]
    a_in, zs = [], []
    for i in range(nl):
        a_in.append(a)
        z = _dot(a, ws[i][...]) + bs[i][...]
        zs.append(z)
        a = rules(z)[0]

    rows = jax.lax.broadcasted_iota(jnp.int32, a.shape, 0) + t * tile
    g = jnp.where(rows == a_ref[0], dm_ref[0], 0.0)
    for i in range(nl - 1, -1, -1):
        gz = g * rules(zs[i])[1]
        dws[i][...] += _outer(a_in[i], gz)
        dbs[i][...] += jnp.sum(gz, axis=0, keepdims=True)
        g = _dot_t(gz, ws[i][...])
    dx_ref[0] = g


@lru_cache(maxsize=None)
def _build(widths, act_name, n_valid, n_pts, n_cases, tile, interpret):
    nl = len(widths) - 1
    fl = widths[-1]
    n_tiles = n_pts // tile
    grid = (n_cases, n_tiles)
    cfg = (widths, act_name, n_valid, tile, nl)

    x_spec = pl.BlockSpec((1, tile, widths[0]), lambda b, t: (b, t, 0))
    w_specs = [pl.BlockSpec((widths[i], widths[i + 1]), lambda b, t: (0, 0))
               for i in range(nl)]
    b_specs = [pl.BlockSpec((1, widths[i + 1]), lambda b, t: (0, 0))
               for i in range(nl)]
    pooled = pl.BlockSpec((1, 1, fl), lambda b, t: (b, 0, 0))

    def run_fwd(x, ws, bs):
        return pl.pallas_call(
            partial(_fwd_kernel, cfg), grid=grid,
            in_specs=[x_spec] + w_specs + b_specs,
            out_specs=[pooled, pooled],
            out_shape=[jax.ShapeDtypeStruct((n_cases, 1, fl), jnp.float32),
                       jax.ShapeDtypeStruct((n_cases, 1, fl), jnp.int32)],
            interpret=interpret,
        )(x, *ws, *bs)

    @jax.custom_vjp
    def fn(x, ws, bs):
        m, amax = run_fwd(x, ws, bs)
        return m, jax.lax.stop_gradient(amax)

    def fn_fwd(x, ws, bs):
        m, amax = run_fwd(x, ws, bs)
        return (m, jax.lax.stop_gradient(amax)), (x, ws, bs, amax)

    def fn_bwd(saved, dm_pair):
        x, ws, bs, amax = saved
        dm = dm_pair[0]
        res = pl.pallas_call(
            partial(_bwd_kernel, cfg), grid=grid,
            in_specs=[x_spec] + w_specs + b_specs + [pooled, pooled],
            out_specs=[x_spec] + w_specs + b_specs,
            out_shape=([jax.ShapeDtypeStruct(x.shape, jnp.float32)]
                       + [jax.ShapeDtypeStruct(w.shape, jnp.float32)
                          for w in ws]
                       + [jax.ShapeDtypeStruct(b.shape, jnp.float32)
                          for b in bs]),
            interpret=interpret,
        )(x, *ws, *bs, amax, dm)
        return res[0], tuple(res[1:1 + nl]), tuple(res[1 + nl:])

    fn.defvjp(fn_fwd, fn_bwd)
    return fn


def pointnet_global(params: dict, layers, x, activation,
                    tile: int = TILE, interpret: bool | None = None,
                    return_argmax: bool = False):
    """Fused ``max over points of MLP(x)``: x (B, N, L0) -> (B, 1, F_last).

    ``params`` is an ``models.mlp.MLP`` parameter tree (``linear_i``); every
    layer is activated (the extractor's ``last_activation=True`` mode).
    With ``return_argmax`` also returns the winning row index per channel
    (B, 1, F_last) int32, non-differentiable — the max-pool-coupled
    derivative path gathers the winners' chains from it.
    """
    if interpret is None:
        interpret = not on_tpu()
    act = _activation_name(activation)
    nl = len(layers) - 1
    ws = tuple(params[f"linear_{i}"]["kernel"].astype(jnp.float32)
               for i in range(nl))
    bs = tuple(params[f"linear_{i}"]["bias"][None, :].astype(jnp.float32)
               for i in range(nl))
    b_cases, n = x.shape[-3], x.shape[-2]
    tile = min(tile, max(8, 1 << (n - 1).bit_length()))
    xp = _pad_pts(x.astype(jnp.float32), 1, tile)
    fn = _build((x.shape[-1],) + tuple(layers[1:]), act, n, xp.shape[1],
                b_cases, tile, interpret)
    m, amax = fn(xp, ws, bs)
    return (m, amax) if return_argmax else m


def supported(activation) -> bool:
    return _activation_name(activation) is not None
