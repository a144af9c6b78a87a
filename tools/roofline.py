"""Measured shape-roofline for the per-family training step (VERDICT r2
weak #1/#6: either lift the family rates or publish a measured proof of
their ceiling).

Method — a ceiling you can defend:
  1. Enumerate each family's matmul layers ANALYTICALLY from its bench-envelope
     architecture (bench.make_model configs), including the (v, J, H)
     derivative-propagation multiplicity (value row + D Jacobian rows +
     D(D+1)/2 Hessian rows per point) and the backward pass (grad step
     ~ 2x forward matmul FLOPs: dX and dW products per layer).
  2. Measure, on the attached chip, the SUSTAINED dot throughput at each
     distinct (M, K, N) — not an 8k-square peak: the model's thin-K/thin-N
     shapes run far below datasheet peak on the MXU, and that gap is
     hardware-shape physics, not implementation slack.
  3. Ceiling steps/s = 1 / sum_i(flops_i / rate_i(shape)).  Compare measured
     steps/s; the ratio is how much implementation headroom remains ON TOP of
     shape physics (fusion, layout, non-matmul physics work, dispatch).

Prints one JSON doc; --update rewrites the ROOFLINE block in PARITY.md.

Usage: python tools/roofline.py [--families pipn,pipn_pp,pi_gano]
"""
import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

BATCH = 13
N_POINTS = 2500         # internal + boundary rows per case (bench envelope)
N_DIMS = 2
VJH = 1 + N_DIMS + N_DIMS * (N_DIMS + 1) // 2   # value + J + sym H rows
BWD = 3.0               # fwd+bwd matmul multiplier (dX + dW per layer)


def mlp_shapes(widths, m, mult=1):
    """[(M, K, N)] for a Dense stack applied to m rows; ``mult`` row
    replication (e.g. VJH) is folded into M — that is how the fused kernels
    actually present the work to the MXU."""
    m = int(m * mult)
    return [(m, k, n) for k, n in zip(widths[:-1], widths[1:])]


def family_shapes(family: str):
    """Analytic matmul inventory at the bench envelope.

    Mirrors bench.make_model configs (examples/*/train.py); derivative paths
    propagate (v, J, H) through every layer => VJH x row multiplicity.
    """
    m_pts = BATCH * N_POINTS
    if family in ("pipn", "pipn_decoupled"):
        enc_local = mlp_shapes([2, 64, 64], m_pts, VJH)
        enc_glob = mlp_shapes([69, 96, 128, 1024], m_pts, VJH)
        dec = mlp_shapes([1088, 512, 256, 128, 3], m_pts, VJH)
        return enc_local + enc_glob + dec
    if family == "pipn_exact":
        # exact autodiff replays the forward 1 + D + D^2 times (jvp-of-vjp)
        mult = 1 + N_DIMS + N_DIMS ** 2
        return (mlp_shapes([2, 64, 64], m_pts, mult)
                + mlp_shapes([69, 96, 128, 1024], m_pts, mult)
                + mlp_shapes([1088, 512, 256, 128, 3], m_pts, mult))
    if family == "pipn_pp":
        enc_local = mlp_shapes([2, 64, 64], m_pts, VJH)
        # SA levels run on centroid neighborhoods (C x K neighbors); level
        # sizes from fe_fraction=[0.5, 0.25] of 1000 boundary rows, K = 64
        sa1 = mlp_shapes([8, 64, 64], BATCH * 500 * 64)
        sa2 = mlp_shapes([66, 128, 128], BATCH * 125 * 64)
        sa3 = mlp_shapes([130, 256, 1024], BATCH * 125)
        dec = mlp_shapes([1088, 378, 128, 3], m_pts, VJH)
        return enc_local + sa1 + sa2 + sa3 + dec
    if family == "pi_gano":
        branch = mlp_shapes([8, 128, 352, 352, 352], BATCH * 1600)
        geom = mlp_shapes([7, 64, 176, 176, 176], BATCH * 1000)
        local = mlp_shapes([2, 64, 176, 176, 176], m_pts, VJH)
        trunk = mlp_shapes([352, 352, 352, 352, 352], m_pts, VJH)
        return branch + geom + local + trunk
    raise KeyError(family)


def measure_dot_rate(m, k, n, dtype="float32", reps=12):
    """Sustained FLOP/s of (m,k)@(k,n).

    Two distinct activation buffers alternate per step (defeats
    loop-invariant hoisting without inflating HBM traffic); weights stay
    resident — both choices are GENEROUS to the ceiling, which is the safe
    direction for a "fraction of ceiling" claim."""
    import jax
    import jax.numpy as jnp

    a = jnp.stack([jnp.ones((m, k), dtype), jnp.full((m, k), 2.0, dtype)])
    b = jnp.ones((k, n), dtype)

    @jax.jit
    def chain(a, b):
        def outer(acc, _):
            def body(acc, x):
                return acc + jax.lax.dot(x, b)[0, 0], ()
            acc, _ = jax.lax.scan(body, acc, a)
            return acc, ()
        acc, _ = jax.lax.scan(outer, jnp.zeros((), a.dtype), None,
                              length=reps)
        return acc

    np.asarray(chain(a, b))  # compile + warm
    t0 = time.perf_counter()
    np.asarray(chain(a, b))
    dt = time.perf_counter() - t0
    return 2.0 * m * k * n * 2 * reps / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--families",
                    default="pipn,pipn_decoupled,pipn_exact,pipn_pp,pi_gano")
    ap.add_argument("--measured", default=None,
                    help="JSON dict family->steps/s (else read BENCH json)")
    ap.add_argument("--update", action="store_true",
                    help="rewrite the ROOFLINE block in PARITY.md")
    args = ap.parse_args()

    measured = json.loads(args.measured) if args.measured else {}

    rate_cache = {}
    report = {}
    for family in args.families.split(","):
        shapes = family_shapes(family)
        total_s = 0.0
        flops = 0.0
        for m, k, n in shapes:
            key = (m, k, n)
            if key not in rate_cache:
                rate_cache[key] = measure_dot_rate(m, k, n)
            f = 2.0 * m * k * n * BWD
            flops += f
            total_s += f / rate_cache[key]
        ceiling = 1.0 / total_s
        entry = {"analytic_matmul_gflops_per_step": round(flops / 1e9, 1),
                 "shape_weighted_rate_tflops":
                     round(flops / total_s / 1e12, 2),
                 "ceiling_steps_per_sec": round(ceiling, 1)}
        if family in measured:
            entry["measured_steps_per_sec"] = measured[family]
            entry["fraction_of_ceiling"] = round(measured[family] / ceiling, 3)
        report[family] = entry
        print(family, json.dumps(entry), flush=True)

    shapes_out = {f"{m}x{k}x{n}": round(r / 1e12, 3)
                  for (m, k, n), r in sorted(rate_cache.items())}
    doc = {"per_family": report, "measured_dot_tflops_by_shape": shapes_out}
    print(json.dumps(doc))

    if args.update:
        lines = ["", "| Family | analytic matmul GF/step | shape-weighted "
                 "sustained TF/s | ceiling steps/s | measured | fraction |",
                 "|---|---|---|---|---|---|"]
        for fam, e in report.items():
            lines.append(
                f"| {fam} | {e['analytic_matmul_gflops_per_step']} "
                f"| {e['shape_weighted_rate_tflops']} "
                f"| {e['ceiling_steps_per_sec']} "
                f"| {e.get('measured_steps_per_sec', '—')} "
                f"| {e.get('fraction_of_ceiling', '—')} |")
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
