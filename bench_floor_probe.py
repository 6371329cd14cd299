"""Deep-MLP floor probes (VERDICT r2 item 6): decompose the streaming-path
step cost by MEASURING THE REAL KERNELS at varied depth and batch, using
the only timing methodology this tunneled chip respects (whole multi-epoch
run = ONE dispatch, closed by host readback — per-call probes, including
pallas_call inside fori_loop, carry 0.4-0.9 ms/iteration of overhead and
synthetic grid-revisit patterns defeat Mosaic's pipelining; both were
tried and produce garbage).

Decomposition:
  t_step(L)   slope over depth = per-layer cost; intercept = fixed
              prefix/suffix/loss/scan overhead per step.
  B=128 vs B=8 at fixed L: per-layer FLOPs shrink 16x while weight/slot
              traffic is unchanged -> if the slope barely moves the layer
              cost is traffic-bound, if it collapses it is compute/latency
              -bound.
  adam-sgd    slope delta = the m/v slot streams (2 extra reads + 2 extra
              writes of W*W*4 per layer) -> implied achievable slot
              bandwidth in the real kernel's access pattern.

Outputs FLOOR_PROBE.json; BENCHMARKS.md "Where the walls are" (round 3)
derives the per-path floors from these numbers.

Usage (real TPU): python bench_floor_probe.py
"""

import json
import statistics
import sys
import time

import numpy as np

sys.path.insert(0, ".")

REPEATS = 3
W = 256
N_TRAIN = 2560


def measure_step_us(depth, batch, opt_name, fused, n_epochs=100):
    """Median us/step of the real path (stream or scan) at this config."""
    import jax  # noqa: F401  (ensures backend up before building)

    from tinynn_autograd_tpu.models import build_deep_mlp
    from tinynn_autograd_tpu.nn.losses import SoftmaxCrossEntropyLoss
    from tinynn_autograd_tpu.nn.model import Model
    from tinynn_autograd_tpu.nn import optimizer as opt
    from tinynn_autograd_tpu.utils.datasets import one_hot
    from tinynn_autograd_tpu.utils.seeder import random_seed

    rng = np.random.RandomState(0)
    dx = rng.randn(N_TRAIN, W).astype(np.float32)
    dy = one_hot(rng.randint(0, 10, N_TRAIN))
    random_seed(0)
    o = opt.Adam(1e-3) if opt_name == "adam" else opt.SGD(1e-2)
    m = Model(build_deep_mlp(num_in=W, depth=depth, width=W, num_out=10,
                             stacked=True),
              SoftmaxCrossEntropyLoss(), o)
    x_dev, y_dev = m.stage(dx, dy)
    steps = n_epochs * (N_TRAIN // batch)

    def run():
        losses = m.train_epochs(x_dev, y_dev, n_epochs=n_epochs,
                                batch_size=batch, fused=fused)
        return float(np.asarray(losses)[-1, -1])

    run()  # compile + warmup (same shape: n_epochs is in the jit key)
    rates = []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        run()
        rates.append((time.perf_counter() - t0) / steps * 1e6)
    return statistics.median(rates)


def main():
    import jax

    print(json.dumps({"backend": jax.default_backend()}), flush=True)
    out = {}

    # depths 48/96/144 share identical layers-per-block (C_fwd=24,
    # C_bwd=6 under the default 24MB budget), so the slope over depth is
    # not contaminated by block-size quantization; 100 epochs = 2000+
    # steps per dispatch keeps the ~20-40ms tunnel RTT under 10%% of the
    # run even for the fastest config.
    configs = [
        # (key, depth, batch, opt, fused)
        ("stream_sgd_L48_B128", 48, 128, "sgd", "stream"),
        ("stream_sgd_L96_B128", 96, 128, "sgd", "stream"),
        ("stream_sgd_L144_B128", 144, 128, "sgd", "stream"),
        ("stream_adam_L48_B128", 48, 128, "adam", "stream"),
        ("stream_adam_L96_B128", 96, 128, "adam", "stream"),
        ("stream_adam_L144_B128", 144, 128, "adam", "stream"),
        ("stream_sgd_L100_B128", 100, 128, "sgd", "stream"),
        ("stream_adam_L100_B128", 100, 128, "adam", "stream"),
        ("stream_sgd_L100_B8", 100, 8, "sgd", "stream"),
        ("stream_adam_L100_B8", 100, 8, "adam", "stream"),
        ("scan_sgd_L100_B128", 100, 128, "sgd", False),
        ("scan_adam_L100_B128", 100, 128, "adam", False),
    ]
    for key, depth, batch, o, fused in configs:
        us = measure_step_us(depth, batch, o, fused)
        out[key] = round(us, 1)
        print(json.dumps({"config": key, "us_per_step": out[key]}),
              flush=True)

    # derived per-layer slopes and intercepts (L=48 -> L=144 over 96
    # layers, identical block sizes)
    for o in ("sgd", "adam"):
        hi = out["stream_%s_L144_B128" % o]
        lo = out["stream_%s_L48_B128" % o]
        slope = (hi - lo) / 96.0
        out["stream_%s_slope_us_per_layer" % o] = round(slope, 3)
        out["stream_%s_intercept_us" % o] = round(
            out["stream_%s_L96_B128" % o] - 96 * slope, 1)
    # slot-stream cost: adam adds 2 reads + 2 writes of W*W*4 per layer
    d_slot = (out["stream_adam_slope_us_per_layer"]
              - out["stream_sgd_slope_us_per_layer"])
    out["slot_traffic_us_per_layer"] = round(d_slot, 3)
    if d_slot > 0:
        bytes_each_way = 2 * W * W * 4
        out["implied_slot_bw_gbs_each_way"] = round(
            bytes_each_way / (d_slot * 1e-6) / 1e9, 1)
    print(json.dumps({k: v for k, v in out.items()
                      if "slope" in k or "intercept" in k or "slot" in k}),
          flush=True)
    with open("FLOOR_PROBE.json", "w") as f:
        json.dump(out, f, indent=1)
    print("wrote FLOOR_PROBE.json")


if __name__ == "__main__":
    main()
