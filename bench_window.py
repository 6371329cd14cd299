"""Sliding-window attention probe (real TPU): the gridded flash kernels
skip the compute AND DMA of tiles outside the causal band, so cost should
scale ~O(T * window) — this measures the actual win vs full causal
attention and vs the XLA fallback at the same window.

Same methodology as bench_attention.py: dependency-chained lax.scan inside
ONE dispatch (thousands of iterations — the ~20-40 ms tunnel RTT rule),
host-readback-closed timing, median of repeats, hardware parity gate
first. One JSON line per row -> WINDOW_PROBE.json (tee it).

    python bench_window.py
"""

import argparse
import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from tinynn_autograd_tpu.ops import attention

    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=0)
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    # (B, H, T, d): long causal rows — where the band skip pays
    shapes = [(2, 8, 2048, 64), (2, 8, 4096, 64)]
    windows = [None, 1024, 512, 256]

    for (b, h, t, d) in shapes:
        iters = args.iters or max(150, 600000 // t)
        rng = np.random.RandomState(0)
        q = jnp.asarray(rng.randn(b, h, t, d).astype(np.float32))
        k = jnp.asarray(rng.randn(b, h, t, d).astype(np.float32))
        v = jnp.asarray(rng.randn(b, h, t, d).astype(np.float32))
        do = jnp.asarray(rng.randn(b, h, t, d).astype(np.float32))
        scale = 1.0 / np.sqrt(d)

        for window in windows:
            tag = "t%d_w%s" % (t, window if window else "full")
            kw = dict(causal=True, scale=scale, window=window)

            # hardware parity gate (pallas vs xla at the same window)
            o_x, lse_x = attention.mha_fwd(q, k, v, impl="xla", **kw)
            o_p, _ = attention.mha_fwd(q, k, v, impl="pallas", **kw)
            err_o = float(jnp.max(jnp.abs(o_p - o_x)))
            g_x = attention.mha_bwd(q, k, v, o_x, lse_x, do, impl="xla",
                                    **kw)
            g_p = attention.mha_bwd(q, k, v, o_x, lse_x, do, impl="pallas",
                                    **kw)
            err_g = max(float(jnp.max(jnp.abs(a - b2)))
                        for a, b2 in zip(g_p, g_x))
            tol = 2e-3 * np.sqrt(t / 128.0)
            assert err_o < tol and err_g < 2 * tol, (tag, err_o, err_g, tol)

            def loop_fwd(impl):
                def run(q0):
                    def body(c, _):
                        o, _l = attention.mha_fwd(c, k, v, impl=impl, **kw)
                        return o, ()
                    out, _ = jax.lax.scan(body, q0, None, length=iters)
                    return out
                return jax.jit(run)

            def loop_fwdbwd(impl):
                def run(q0):
                    def body(c, _):
                        o, lse = attention.mha_fwd(c, k, v, impl=impl,
                                                   **kw)
                        dq, dk, dv = attention.mha_bwd(
                            c, k, v, o, lse, do, impl=impl, **kw)
                        return dq + 1e-20 * dk + 1e-20 * dv, ()
                    out, _ = jax.lax.scan(body, q0, None, length=iters)
                    return out
                return jax.jit(run)

            row = {"metric": "window_attn_" + tag,
                   "parity_fwd": round(err_o, 6),
                   "parity_bwd": round(err_g, 6)}
            for name, make in (("fwd", loop_fwd), ("fwdbwd", loop_fwdbwd)):
                for impl in ("xla", "pallas"):
                    fn = make(impl)
                    float(jnp.sum(fn(q)))
                    best = []
                    for _ in range(args.repeats):
                        t0 = time.perf_counter()
                        float(jnp.sum(fn(q)))
                        best.append((time.perf_counter() - t0) / iters)
                    us = sorted(best)[len(best) // 2] * 1e6
                    row["%s_%s_us" % (name, impl)] = round(us, 2)
            print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
