"""Transformer-block megakernel probe (VERDICT r4 item 5).

Times the fused single-kernel block FORWARD (ops/block_kernel.py: LN +
QKV + per-head attention + MLP, weights VMEM-resident) against the jitted
XLA forward of the IDENTICAL block at the bench transformer config
(dim 256, heads 8, T 128 — bench_all config 6), plus the long-context 6b
shape. Protocol: dependency-chained lax.scan, thousands of iterations per
dispatch, readback-closed, median of repeats (CLAUDE.md tunnel rules).

Writes BLOCK_PROBE.json. Decision rule (from the VERDICT): if the fused
kernel wins, wire it as a fourth execution tier; if not, this artifact IS
the measured in-kernel number that replaces the standalone-matmul
extrapolation in BENCHMARKS.md wall 5.

Usage: python bench_block_probe.py [--iters N] [--repeats R]
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

    from tinynn_autograd_tpu.nn.layers import TransformerBlock
    from tinynn_autograd_tpu.ops import block_kernel
    from tinynn_autograd_tpu.core.tensor import Tensor
    from tinynn_autograd_tpu.utils.seeder import random_seed

    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=0)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--out", default="BLOCK_PROBE.json")
    args = ap.parse_args()

    configs = [
        # (B, T, D, heads, causal, batch_blocks to sweep)
        (32, 128, 256, 8, False, (2, 4, 8)),
        (32, 128, 256, 8, True, (2, 4, 8)),
        # t=512: g=2 exceeds the 16M scoped-VMEM stack (measured 16.82M —
        # the 8 unrolled per-head [G,T,T] score/prob tiles dominate)
        (8, 512, 256, 8, True, (1,)),
    ]
    results = []
    for (b, t, d, heads, causal, gs) in configs:
        random_seed(0)
        blk = TransformerBlock(dim=d, num_heads=heads, causal=causal,
                               seed=3)
        params = {k: v.data for k, v in blk.params.items()}
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(b, t, d).astype(np.float32) * 0.5)
        tag = "b%dt%dd%dh%d%s" % (b, t, d, heads, "c" if causal else "")
        iters = args.iters or max(200, 400000 // t)

        def xla_fwd(xin):
            return blk.forward(Tensor(xin)).data

        # Hardware numerics gate (kernel vs the tape block's XLA forward).
        # Bit parity lives in the suite (tests/test_pallas.py interpret
        # mode); on-chip, XLA's DEFAULT f32 matmuls use bf16 passes while
        # the kernel accumulates f32, so compare against a HIGHEST-precision
        # reference and admit bf16-pass-scale drift across the 6-matmul
        # chain (round-5 measured: 8.1e-3 vs the default-precision ref).
        with jax.default_matmul_precision("highest"):
            ref = np.asarray(jax.jit(xla_fwd)(x))
        errs = {}
        ok_gs = []
        for g in gs:
            try:
                got = np.asarray(block_kernel.block_fwd_pallas(
                    x, params, heads, causal=causal, batch_block=g))
            except Exception as e:  # VMEM stack OOM etc.: record + skip
                errs["g%d" % g] = "failed: %s" % type(e).__name__
                continue
            err = float(np.max(np.abs(got - ref)))
            errs["g%d" % g] = round(err, 6)
            assert err < 2e-2, (tag, g, err)
            ok_gs.append(g)
        gs = ok_gs

        def timed(fn):
            float(jnp.sum(fn(x)))
            best = []
            for _ in range(args.repeats):
                t0 = time.perf_counter()
                float(jnp.sum(fn(x)))
                best.append((time.perf_counter() - t0) / iters)
            return sorted(best)[len(best) // 2] * 1e6

        def loop(fwd):
            def run(x0):
                def body(c, _):
                    return fwd(c).astype(c.dtype), ()
                return jax.lax.scan(body, x0, None, length=iters)[0]
            return jax.jit(run)

        row = {"shape": tag, "iters": iters, "max_err_vs_highest": errs}
        row["xla_us"] = round(timed(loop(xla_fwd)), 2)
        best_g, best_us = None, float("inf")
        for g in gs:
            us = timed(loop(lambda c, g=g: block_kernel.block_fwd_pallas(
                c, params, heads, causal=causal, batch_block=g)))
            row["pallas_g%d_us" % g] = round(us, 2)
            if us < best_us:
                best_g, best_us = g, us
        if best_g is not None:
            row["pallas_best_us"] = round(best_us, 2)
            row["pallas_best_g"] = best_g
            row["pallas_vs_xla"] = round(row["xla_us"] / best_us, 3)
        else:
            row["pallas"] = "no batch_block fits scoped VMEM"
        results.append(row)
        print(json.dumps(row), flush=True)

    with open(args.out, "w") as f:
        json.dump({"probe": "fused_transformer_block_forward",
                   "results": results}, f, indent=1)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
