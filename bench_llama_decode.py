"""Serving decode benchmark: KV-cache autoregressive generation throughput
for the llama family (models/generate.py) — MHA vs GQA vs MQA caches.

The whole generation (batched prefill + n_new decode steps) is ONE jitted
scan, i.e. one device dispatch per call — the tunnel RTT is paid once per
measurement, not per token (the honest-amortization rule, CLAUDE.md).
Warmup compiles each (net, shape) before timing; repeats report median +
spread. Prints one JSON line per config:

    python bench_llama_decode.py                  # real TPU
    TINYNN_TPU_PLATFORM=cpu python bench_llama_decode.py --tiny   # smoke

The GQA rows quantify the serving saving this family exists for: the
per-block cache is [B, Hkv, T, hd] — kv_heads/heads of the MHA cache
bytes — and every decode step streams the whole cache through the
attention reads, so cache bytes ARE the decode-bandwidth bound at long T.
"""

import argparse
import json
import os
import statistics
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true",
                    help="CPU smoke shapes")
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    if os.environ.get("TINYNN_TPU_PLATFORM"):
        import jax

        jax.config.update("jax_platforms",
                          os.environ["TINYNN_TPU_PLATFORM"])
    import jax

    from tinynn_autograd_tpu.models import build_tiny_llama, generate
    from tinynn_autograd_tpu.utils.seeder import random_seed

    if args.tiny:
        vocab, dim, heads, depth = 32, 64, 4, 2
        batch, t0, n_new = 2, 8, 32
        kv_sweep = [4, 2, 1]
    else:
        vocab, dim, heads, depth = 256, 512, 8, 4
        batch, t0, n_new = 8, 32, 512
        kv_sweep = [8, 2, 1]   # MHA, GQA 4x, MQA 8x

    rng = np.random.RandomState(0)
    prompt = rng.randint(0, vocab, (batch, t0))

    for kv in kv_sweep:
        random_seed(0)
        net = build_tiny_llama(vocab=vocab, dim=dim, heads=heads,
                               kv_heads=kv, depth=depth)
        net.init((batch, t0))
        # warmup: compiles the prefill+decode scan for this shape
        out = np.asarray(generate(net, prompt, n_new))
        assert out.shape == (batch, t0 + n_new)
        rates = []
        for _ in range(args.repeats):
            t_start = time.perf_counter()
            out = np.asarray(generate(net, prompt, n_new))  # host readback
            dt = time.perf_counter() - t_start
            rates.append(batch * n_new / dt)
        med = statistics.median(rates)
        hd = dim // heads
        cache_mb = (2 * depth * batch * kv * (t0 + n_new) * hd * 4
                    / 1024 / 1024)
        print(json.dumps({
            "metric": "llama_decode_tokens_per_sec_kv%d" % kv,
            "value": round(med, 1),
            "unit": "tokens/s (batch %d, %d blocks, dim %d, %d q heads, "
                    "%d kv heads, %d new tokens, one-dispatch scan)"
                    % (batch, depth, dim, heads, kv, n_new),
            "spread_pct": round(100 * (max(rates) - min(rates)) / med, 1),
            "kv_cache_mb": round(cache_mb, 2)}), flush=True)


if __name__ == "__main__":
    main()
