"""Data-parallel scaling curve on a host-simulated CPU mesh (driver config
#5 evidence when only one real chip is available).

Forces the CPU platform carved into 8 virtual devices, then for mesh sizes
1/2/4/8 runs one-dispatch DP epochs (shard_map + per-step gradient pmean)
at a FIXED global batch and asserts loss parity against single-device
training before timing. All 8 virtual devices timeshare one host core, so
wall-clock cannot show speedup — the curve documents that the collective
path scales mechanically (same losses, per-device work 1/N, one all-reduce
per step) and what the shard_map machinery costs. Real-ICI scaling needs a
real multi-chip slice.

Prints one JSON line per mesh size.
"""

import json
import os
import statistics
import sys
import time

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np  # noqa: E402
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, ".")

REPEATS = 5


def main():
    from tinynn_autograd_tpu.models import build_mnist_mlp
    from tinynn_autograd_tpu.nn.losses import SoftmaxCrossEntropyLoss
    from tinynn_autograd_tpu.nn.model import Model
    from tinynn_autograd_tpu.nn.optimizer import Adam
    from tinynn_autograd_tpu.parallel import DataParallel, make_mesh
    from tinynn_autograd_tpu.utils.datasets import one_hot, synthetic_mnist
    from tinynn_autograd_tpu.utils.seeder import random_seed

    random_seed(0)
    (tx, ty), _ = synthetic_mnist(n_train=4096, n_test=16)
    ty_oh = one_hot(ty)
    gbatch = 512
    steps = 4096 // gbatch

    def fresh_model():
        random_seed(1)
        return Model(build_mnist_mlp(), SoftmaxCrossEntropyLoss(),
                     Adam(1e-3))

    def ref_losses_for(n_dev):
        """Single-device losses over the SAME batch composition the DP
        epoch uses: the dataset is sharded across devices first, then
        batched locally — batch i is the union of every shard's local
        batch i (see tests/test_parallel.py::test_dp_epoch_matches_step_loop)."""
        ref = fresh_model()
        per_x = np.split(tx, n_dev)
        per_y = np.split(ty_oh, n_dev)
        local = gbatch // n_dev
        out = []
        for i in range(steps):
            xb = np.concatenate([d[i * local:(i + 1) * local] for d in per_x])
            yb = np.concatenate([d[i * local:(i + 1) * local] for d in per_y])
            out.append(float(ref.train_step(xb, yb)))
        return np.asarray(out)

    for n_dev in (1, 2, 4, 8):
        dp = DataParallel(fresh_model(), mesh=make_mesh(n_dev))
        gx, gy = dp.stage(tx, ty_oh)
        losses = np.asarray(dp.train_epoch(gx, gy, batch_size=gbatch,
                                           shuffle=False))
        np.testing.assert_allclose(losses, ref_losses_for(n_dev),
                                   rtol=2e-4, atol=1e-6)
        rates = []
        for _ in range(REPEATS + 1):  # first timed run discarded (cold)
            t0 = time.perf_counter()
            out = dp.train_epoch(gx, gy, batch_size=gbatch, shuffle=False)
            float(np.asarray(out)[-1])
            rates.append(steps / (time.perf_counter() - t0))
        rates = rates[1:]
        med = statistics.median(rates)
        print(json.dumps({
            "metric": "dp_sim_mesh%d_steps_per_sec" % n_dev,
            "value": round(med, 2), "unit": "steps/s",
            "global_batch": gbatch, "repeats": REPEATS,
            "spread_pct": round(100 * (max(rates) - min(rates)) / med, 1),
            "loss_parity_vs_single": True}), flush=True)


def pp_section():
    """Pipeline parallelism on the sim mesh: 8-stage GPipe vs the same
    model single-device, loss parity asserted first (same caveat: the 8
    virtual devices timeshare one host core, so PP pays collective +
    bubble costs with no parallel hardware to win back)."""
    from tinynn_autograd_tpu.models import build_deep_mlp
    from tinynn_autograd_tpu.nn.losses import SoftmaxCrossEntropyLoss
    from tinynn_autograd_tpu.nn.model import Model
    from tinynn_autograd_tpu.nn.optimizer import Adam
    from tinynn_autograd_tpu.parallel import PipelineParallel, make_mesh
    from tinynn_autograd_tpu.utils.seeder import random_seed

    B, F, W, D, C = 512, 64, 256, 18, 10
    rng = np.random.RandomState(0)
    x = rng.randn(B, F).astype(np.float32)
    y = np.eye(C, dtype=np.float32)[rng.randint(0, C, B)]

    def mk():
        random_seed(1)
        return Model(build_deep_mlp(num_in=F, depth=D, width=W, num_out=C),
                     SoftmaxCrossEntropyLoss(), Adam(lr=1e-3))

    single = mk()
    pp = PipelineParallel(mk(), mesh=make_mesh(8, axis_name="pp"),
                          microbatches=8)
    for _ in range(3):
        np.testing.assert_allclose(float(pp.train_step(x, y)),
                                   float(single.train_step(x, y)),
                                   rtol=3e-4, atol=1e-6)

    def rate(fn):
        rates = []
        for _ in range(REPEATS + 1):
            t0 = time.perf_counter()
            for _ in range(4):
                loss = fn()
            float(loss)
            rates.append(4 / (time.perf_counter() - t0))
        return rates[1:]

    r_single = rate(lambda: single.train_step(x, y))
    r_pp = rate(lambda: pp.train_step(x, y))
    for name, rates in [("single_device", r_single), ("pp_8stage", r_pp)]:
        med = statistics.median(rates)
        print(json.dumps({
            "metric": "pp_sim_%s_steps_per_sec" % name,
            "value": round(med, 2), "unit": "steps/s", "batch": B,
            "model": "deep MLP d%d w%d" % (D, W), "repeats": REPEATS,
            "spread_pct": round(100 * (max(rates) - min(rates)) / med, 1),
            "loss_parity_vs_single": True}), flush=True)


if __name__ == "__main__":
    main()
    pp_section()
