"""Flash-attention kernel: on-chip validation + microbench vs XLA.

1. Correctness on REAL TPU hardware (interpret mode can't prove Mosaic
   lowering): Pallas fwd/bwd vs the exact-math XLA twin at the driver
   transformer config's shapes and at long sequence lengths.
2. Timing: per-call fwd and fwd+bwd cost, Pallas vs XLA, amortized over a
   dependency-chained lax.scan inside ONE dispatch (tunnel RTT ~20-40 ms;
   see CLAUDE.md) and closed by a host readback.

Usage: python bench_attention.py [--iters N]
Prints one JSON line per (shape, impl, direction).
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
    ap.add_argument("--iters", type=int, default=0,
                    help="chained iterations per dispatch; 0 = auto-scale "
                         "per shape so the ~20-40ms tunnel RTT stays <10%% "
                         "of the run (200 was RTT-dominated — round-4 "
                         "lesson, CLAUDE.md)")
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    # (B, H, T, d, causal): driver config 6 is (32, 8, 128, 32); the long
    # rows are where O(T) memory beats XLA's materialized [T, T] scores
    shapes = [
        (32, 8, 128, 32, False),
        (32, 8, 128, 32, True),
        (8, 8, 1024, 64, True),
        (2, 8, 4096, 64, True),
    ]

    for (b, h, t, d, causal) in shapes:
        iters = args.iters or max(150, 600000 // t)
        rng = np.random.RandomState(0)
        q = jnp.asarray(rng.randn(b, h, t, d).astype(np.float32))
        k = jnp.asarray(rng.randn(b, h, t, d).astype(np.float32))
        v = jnp.asarray(rng.randn(b, h, t, d).astype(np.float32))
        do = jnp.asarray(rng.randn(b, h, t, d).astype(np.float32))
        scale = 1.0 / np.sqrt(d)
        tag = "b%dh%dt%dd%d%s" % (b, h, t, d, "c" if causal else "")

        # ---- hardware numerics check --------------------------------------
        o_x, lse_x = attention.mha_fwd(q, k, v, causal=causal, scale=scale,
                                       impl="xla")
        o_p, lse_p = attention.mha_fwd(q, k, v, causal=causal, scale=scale,
                                       impl="pallas")
        err_o = float(jnp.max(jnp.abs(o_p - o_x)))
        g_x = attention.mha_bwd(q, k, v, o_x, lse_x, do, causal=causal,
                                scale=scale, impl="xla")
        g_p = attention.mha_bwd(q, k, v, o_x, lse_x, do, causal=causal,
                                scale=scale, impl="pallas")
        err_g = max(float(jnp.max(jnp.abs(a - b2)))
                    for a, b2 in zip(g_p, g_x))
        print(json.dumps({"metric": "attn_parity_" + tag,
                          "max_abs_err_fwd": err_o,
                          "max_abs_err_bwd": err_g}), flush=True)
        # tolerance: on TPU, BOTH impls sit at the platform's default-
        # precision f32 matmul error vs a float64 oracle (measured equal,
        # 7e-3 abs at t=1024) — the gap between them is smaller than
        # either's gap to the truth and grows ~sqrt(T)
        tol = 2e-3 * np.sqrt(t / 128.0)
        assert err_o < tol and err_g < 2 * tol, (err_o, err_g, tol)

        # ---- timing -------------------------------------------------------
        def loop_fwd(impl):
            def run(q0):
                def body(c, _):
                    o, _l = attention.mha_fwd(c, k, v, causal=causal,
                                              scale=scale, impl=impl)
                    return o, ()
                out, _ = jax.lax.scan(body, q0, None, length=iters)
                return out
            return jax.jit(run)

        def loop_fwdbwd(impl):
            def run(q0):
                def body(c, _):
                    o, lse = attention.mha_fwd(c, k, v, causal=causal,
                                               scale=scale, impl=impl)
                    dq, dk, dv = attention.mha_bwd(
                        c, k, v, o, lse, do, causal=causal, scale=scale,
                        impl=impl)
                    # keep dk/dv live (a dq-only carry lets XLA dead-code
                    # half the backward and flatters its number)
                    return dq + 1e-20 * dk + 1e-20 * dv, ()
                out, _ = jax.lax.scan(body, q0, None, length=iters)
                return out
            return jax.jit(run)

        for name, make in (("fwd", loop_fwd), ("fwdbwd", loop_fwdbwd)):
            for impl in ("xla", "pallas"):
                fn = make(impl)
                float(jnp.sum(fn(q)))  # compile + warmup, readback-closed
                best = []
                for _ in range(args.repeats):
                    t0 = time.perf_counter()
                    float(jnp.sum(fn(q)))
                    best.append((time.perf_counter() - t0) / iters)
                us = sorted(best)[len(best) // 2] * 1e6
                print(json.dumps({
                    "metric": "attn_%s_%s_%s_us" % (name, impl, tag),
                    "value": round(us, 2)}), flush=True)


if __name__ == "__main__":
    main()
