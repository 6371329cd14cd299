"""Headline benchmark: MNIST MLP fused-train-step throughput on one chip.

Exact flagship config (reference: examples/mnist/run.py:59-71,98-101):
784-200-100-70-30-10 Dense+ReLU, softmax-CE, Adam lr=1e-3, batch 128.
Baseline: the reference's measured 45.9 steps/s on CPU/NumPy eager
(BASELINE.md; measured on synthetic batches, FLOP-identical — same
methodology used here).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

BASELINE_STEPS_PER_SEC = 45.9


def main():
    import jax

    from tinynn_autograd_tpu.models import build_mnist_mlp
    from tinynn_autograd_tpu.nn.losses import SoftmaxCrossEntropyLoss
    from tinynn_autograd_tpu.nn.model import Model
    from tinynn_autograd_tpu.nn.optimizer import Adam
    from tinynn_autograd_tpu.utils.datasets import synthetic_mnist, one_hot
    from tinynn_autograd_tpu.utils.seeder import random_seed

    random_seed(0)
    (train_x, train_y), _ = synthetic_mnist(n_train=12800, n_test=16)
    train_y = one_hot(train_y)

    model = Model(build_mnist_mlp(), SoftmaxCrossEntropyLoss(), Adam(lr=1e-3))

    batch = 128
    # stage the dataset into HBM once; epochs then run as ONE dispatch each
    # (lax.scan over the fused step) with zero host<->device traffic
    x_dev, y_dev = model.stage(train_x, train_y)
    steps_per_epoch = len(train_x) // batch

    # warmup: compile + one steady epoch. NB: timing is closed by a host
    # readback of the final loss, not block_until_ready — on tunneled/remote
    # platforms only a readback reliably observes execution completion.
    losses = model.train_epoch(x_dev, y_dev, batch_size=batch)
    losses = model.train_epoch(x_dev, y_dev, batch_size=batch)
    float(np.asarray(losses)[-1])

    # enough epochs that the single closing readback RTT (~30ms on tunneled
    # platforms) is noise
    n_epochs = 40
    start = time.perf_counter()
    for _ in range(n_epochs):
        losses = model.train_epoch(x_dev, y_dev, batch_size=batch)
    final_loss = float(np.asarray(losses)[-1])
    elapsed = time.perf_counter() - start
    assert np.isfinite(final_loss)

    steps_per_sec = n_epochs * steps_per_epoch / elapsed
    print(json.dumps({
        "metric": "mnist_mlp_train_steps_per_sec",
        "value": round(steps_per_sec, 2),
        "unit": "steps/s",
        "vs_baseline": round(steps_per_sec / BASELINE_STEPS_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
