"""MNIST MLP — the flagship config (reference: examples/mnist/run.py:59-69):
784 -> 200 -> 100 -> 70 -> 30 -> 10 Dense stack with ReLU."""

from tinynn_autograd_tpu.nn.layers import Dense, ReLU
from tinynn_autograd_tpu.nn.net import Net


def build_mnist_mlp(num_in=784, hidden=(200, 100, 70, 30), num_out=10,
                    activation=ReLU, compute_dtype=None):
    layers = []
    prev = num_in
    for h in hidden:
        layers.append(Dense(h, num_in=prev, compute_dtype=compute_dtype))
        layers.append(activation())
        prev = h
    layers.append(Dense(num_out, num_in=prev, compute_dtype=compute_dtype))
    return Net(layers)


def build_deep_mlp(num_in=256, depth=100, width=256, num_out=10,
                   stacked=False):
    """Deep-graph autograd stress config (driver config #3): ``depth`` Dense
    layers; exercises long tapes under a single jitted step.

    stacked=True replaces the per-layer body with one DenseStack (scan over
    stacked weights): identical numerics up to init draw order, two scan
    kernels per step instead of hundreds of per-layer kernels."""
    if stacked:
        from tinynn_autograd_tpu.nn.layers import DenseStack

        return Net([
            Dense(width, num_in=num_in), ReLU(),
            DenseStack(depth - 2, width=width, activation="relu"),
            Dense(num_out, num_in=width),
        ])
    layers = []
    prev = num_in
    for _ in range(depth - 1):
        layers.append(Dense(width, num_in=prev))
        layers.append(ReLU())
        prev = width
    layers.append(Dense(num_out, num_in=prev))
    return Net(layers)
