"""Short-T attention probe (VERDICT r4 item 4).

Round 4 measured the gridded flash kernel losing 3x to XLA at t=128 and
routed around it (_PALLAS_MIN_T=1024) — a measured observation, not a
proven ceiling. This probe attacks the regime with the SINGLE-GRID-STEP
variant (ops/attention.py _fwd_kernel_single: whole [T, T] tile resident,
direct softmax, no online-softmax scratch machinery) and a head-batch (G)
sweep, at t in {128, 256, 512} on the driver config's head shape.

Timing protocol: dependency-chained lax.scan, thousands of iterations per
dispatch, host-readback close, median of repeats (CLAUDE.md tunnel rules).
Writes ATTN_SHORT_PROBE.json; if the kernel wins anywhere below 1024 the
dispatch crossover gets updated, otherwise the JSON is the measured
negative.

Usage: python bench_attn_short.py [--iters N] [--repeats R]
"""

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    from tinynn_autograd_tpu.ops import attention

    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=0)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--out", default="ATTN_SHORT_PROBE.json")
    ap.add_argument("--only", default="",
                    help="comma-separated shape-tag substrings to run "
                         "(e.g. 't512'); empty = all")
    args = ap.parse_args()

    shapes = [
        (32, 8, 128, 32, False),
        (32, 8, 128, 32, True),
        (32, 8, 256, 32, True),
        (16, 8, 512, 64, True),
        # dispatch-boundary coverage: the t >= 512 single-kernel rule
        # engages regardless of d / causal — verify it doesn't regress
        # the other t=512 corners
        (16, 8, 512, 64, False),
        (16, 8, 512, 32, True),
    ]
    results = []

    for (b, h, t, d, causal) in shapes:
        tag0 = "b%dh%dt%dd%d%s" % (b, h, t, d, "c" if causal else "")
        if args.only and not any(s in tag0 for s in args.only.split(",")):
            continue
        iters = args.iters or max(300, 1200000 // t)
        rng = np.random.RandomState(0)
        q = jnp.asarray(rng.randn(b, h, t, d).astype(np.float32))
        k = jnp.asarray(rng.randn(b, h, t, d).astype(np.float32))
        v = jnp.asarray(rng.randn(b, h, t, d).astype(np.float32))
        do = jnp.asarray(rng.randn(b, h, t, d).astype(np.float32))
        scale = 1.0 / np.sqrt(d)
        tag = "b%dh%dt%dd%d%s" % (b, h, t, d, "c" if causal else "")

        # hardware numerics gate for the single-kernel path
        o_x, lse_x = attention.mha_fwd(q, k, v, causal=causal, scale=scale,
                                       impl="xla")
        o_p, lse_p = attention.mha_fwd(q, k, v, causal=causal, scale=scale,
                                       impl="pallas")
        err = float(jnp.max(jnp.abs(o_p - o_x)))
        assert err < 2e-3 * np.sqrt(t / 128.0), (tag, err)

        def timed(fn, ref):
            float(jnp.sum(fn(ref)))  # compile + warmup, readback-closed
            best = []
            for _ in range(args.repeats):
                t0 = time.perf_counter()
                float(jnp.sum(fn(ref)))
                best.append((time.perf_counter() - t0) / iters)
            return sorted(best)[len(best) // 2] * 1e6

        def loop_fwd(impl):
            def run(q0):
                def body(c, _):
                    o, _l = attention.mha_fwd(c, k, v, causal=causal,
                                              scale=scale, impl=impl)
                    return o, ()
                return jax.lax.scan(body, q0, None, length=iters)[0]
            return jax.jit(run)

        def loop_fwdbwd(impl):
            def run(q0):
                def body(c, _):
                    o, lse = attention.mha_fwd(c, k, v, causal=causal,
                                               scale=scale, impl=impl)
                    dq, dk, dv = attention.mha_bwd(
                        c, k, v, o, lse, do, causal=causal, scale=scale,
                        impl=impl)
                    return dq + 1e-20 * dk + 1e-20 * dv, ()
                return jax.lax.scan(body, q0, None, length=iters)[0]
            return jax.jit(run)

        row = {"shape": tag, "iters": iters, "fwd": {}, "fwdbwd": {}}
        row["fwd"]["xla"] = round(timed(loop_fwd("xla"), q), 2)
        row["fwdbwd"]["xla"] = round(timed(loop_fwdbwd("xla"), q), 2)

        # G sweep for the single-grid-step kernel (VMEM budget permitting)
        bh = b * h
        gs = [None] + [g for g in (4, 8, 16, 32)
                       if bh % g == 0 and g * t * max(t, 128) * 4 * 3
                       < 14 * 1024 * 1024]
        best_g, best_us = None, float("inf")
        for g in gs:
            attention._FORCE_G = str(g) if g else None
            try:
                us = timed(loop_fwd("pallas"), q)
            except Exception as e:  # VMEM OOM at large G: record + skip
                row["fwd"]["pallas_g%s" % g] = "failed: %s" % type(e).__name__
                continue
            row["fwd"]["pallas_g%s" % (g or "auto")] = round(us, 2)
            if us < best_us:
                best_g, best_us = g, us
        row["fwd"]["pallas_best"] = round(best_us, 2)
        row["fwd"]["pallas_best_g"] = best_g or "auto"

        # independent G sweep for fwd+bwd (the round-5 fused single-block
        # backward has its own VMEM profile — the fwd-optimal G need not
        # match)
        bbest_g, bbest_us = None, float("inf")
        for g in gs:
            attention._FORCE_G = str(g) if g else None
            try:
                us = timed(loop_fwdbwd("pallas"), q)
            except Exception as e:
                row["fwdbwd"]["pallas_g%s" % g] = (
                    "failed: %s" % type(e).__name__)
                continue
            row["fwdbwd"]["pallas_g%s" % (g or "auto")] = round(us, 2)
            if us < bbest_us:
                bbest_g, bbest_us = g, us
        attention._FORCE_G = None
        row["fwdbwd"]["pallas"] = round(bbest_us, 2)
        row["fwdbwd"]["pallas_best_g"] = bbest_g or "auto"
        row["fwd"]["pallas_vs_xla"] = round(row["fwd"]["xla"] / best_us, 3)
        row["fwdbwd"]["pallas_vs_xla"] = round(
            row["fwdbwd"]["xla"] / row["fwdbwd"]["pallas"], 3)
        results.append(row)
        print(json.dumps(row), flush=True)

    with open(args.out, "w") as f:
        json.dump({"probe": "short_t_attention_single_grid_step",
                   "results": results}, f, indent=1)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
