"""Per-config benchmark sweep over the driver's five configs (bench.py stays
the single-line headline). Prints one JSON line per config.

All timings are closed by a host readback (NOT block_until_ready, which does
not block through tunneled platforms) and amortized over enough steps that
the ~30ms readback RTT is noise.

Configs (BASELINE.json):
 1. mnist_mlp      — flagship MLP fused steps/s (same as bench.py)
 2. optimizer_zoo  — Adam vs SGD/Momentum/RMSProp step cost ratio
 3. deep_mlp_100   — 100-layer MLP: long-tape fused step
 4. mnist_cnn      — Conv2D+MaxPool CNN (im2col matmul) steps/s
 5. data_parallel  — 8-way DP step on a simulated mesh (CPU) or 1-dev TPU
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

BASELINE = 45.9  # reference MNIST MLP steps/s (BASELINE.md)


def _time_epochs(model, x_dev, y_dev, batch, n_epochs, steps_per_epoch):
    # one dispatch for the whole measured run; warmup compiles the SAME
    # program; closed by a host readback (block_until_ready can't be
    # trusted on tunneled platforms)
    losses = model.train_epochs(x_dev, y_dev, n_epochs=n_epochs,
                                batch_size=batch)
    float(np.asarray(losses)[-1, -1])
    start = time.perf_counter()
    losses = model.train_epochs(x_dev, y_dev, n_epochs=n_epochs,
                                batch_size=batch)
    float(np.asarray(losses)[-1, -1])
    return n_epochs * steps_per_epoch / (time.perf_counter() - start)


def emit(metric, value, unit, vs=None):
    rec = {"metric": metric, "value": round(value, 2), "unit": unit}
    if vs is not None:
        rec["vs_baseline"] = round(vs, 2)
    print(json.dumps(rec), flush=True)


def main():
    from tinynn_autograd_tpu.models import (
        build_deep_mlp, build_mnist_cnn, build_mnist_mlp,
    )
    from tinynn_autograd_tpu.nn.losses import SoftmaxCrossEntropyLoss
    from tinynn_autograd_tpu.nn.model import Model
    from tinynn_autograd_tpu.nn import optimizer as opt
    from tinynn_autograd_tpu.utils.datasets import one_hot, synthetic_mnist
    from tinynn_autograd_tpu.utils.seeder import random_seed

    random_seed(0)
    batch = 128
    (tx, ty), _ = synthetic_mnist(n_train=12800, n_test=16)
    ty_oh = one_hot(ty)

    # 1. flagship MLP
    m = Model(build_mnist_mlp(), SoftmaxCrossEntropyLoss(), opt.Adam(1e-3))
    x_dev, y_dev = m.stage(tx, ty_oh)
    sps = _time_epochs(m, x_dev, y_dev, batch, 40, len(tx) // batch)
    emit("mnist_mlp_train_steps_per_sec", sps, "steps/s", sps / BASELINE)

    # 2. optimizer zoo: per-optimizer fused step cost
    for name, o in [("sgd", opt.SGD(0.01)), ("momentum", opt.Momentum(0.01)),
                    ("rmsprop", opt.RMSProp(1e-3)), ("adam", opt.Adam(1e-3))]:
        random_seed(0)
        m = Model(build_mnist_mlp(), SoftmaxCrossEntropyLoss(), o)
        sps = _time_epochs(m, x_dev, y_dev, batch, 20, len(tx) // batch)
        emit("mnist_mlp_%s_steps_per_sec" % name, sps, "steps/s")

    # 3. deep-graph stress: 100-layer MLP (stacked scan body)
    random_seed(0)
    m = Model(build_deep_mlp(num_in=256, depth=100, width=256, num_out=10,
                             stacked=True),
              SoftmaxCrossEntropyLoss(), opt.Adam(1e-3))
    rng = np.random.RandomState(0)
    dx = rng.randn(2560, 256).astype(np.float32)
    dy = one_hot(rng.randint(0, 10, 2560))
    dx_dev, dy_dev = m.stage(dx, dy)
    sps = _time_epochs(m, dx_dev, dy_dev, batch, 10, len(dx) // batch)
    emit("deep_mlp_100layer_steps_per_sec", sps, "steps/s")

    # 4. CNN
    random_seed(0)
    m = Model(build_mnist_cnn(), SoftmaxCrossEntropyLoss(), opt.Adam(1e-3))
    cx = tx[:2560].reshape(-1, 28, 28, 1)
    cx_dev, cy_dev = m.stage(cx, ty_oh[:2560])
    sps = _time_epochs(m, cx_dev, cy_dev, batch, 20, len(cx) // batch)
    emit("mnist_cnn_train_steps_per_sec", sps, "steps/s")

    # 5. data parallel over whatever mesh this host offers (one-dispatch
    # epochs with per-step gradient psum)
    import jax

    from tinynn_autograd_tpu.parallel import DataParallel, make_mesh

    n_dev = len(jax.devices())
    random_seed(0)
    m = Model(build_mnist_mlp(), SoftmaxCrossEntropyLoss(), opt.Adam(1e-3))
    dp = DataParallel(m, mesh=make_mesh(n_dev))
    gx, gy = dp.stage(tx[:12800], ty_oh[:12800])
    n_ep = 10
    losses = None
    for _ in range(2):  # warmup compile + steady
        losses = dp.train_epoch(gx, gy, batch_size=1024)
    float(np.asarray(losses)[-1])
    steps_per_ep = 12800 // 1024
    start = time.perf_counter()
    for _ in range(n_ep):
        losses = dp.train_epoch(gx, gy, batch_size=1024)
    float(np.asarray(losses)[-1])
    emit("dp_%ddev_global_batch1024_steps_per_sec" % n_dev,
         n_ep * steps_per_ep / (time.perf_counter() - start), "steps/s")


if __name__ == "__main__":
    main()
