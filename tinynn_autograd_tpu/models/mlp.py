"""MNIST MLP — the flagship config (reference: examples/mnist/run.py:59-69):
784 -> 200 -> 100 -> 70 -> 30 -> 10 Dense stack with ReLU."""

from tinynn_autograd_tpu.nn.layers import Dense, ReLU
from tinynn_autograd_tpu.nn.net import Net


def build_mnist_mlp(num_in=784, hidden=(200, 100, 70, 30), num_out=10,
                    activation=ReLU):
    layers = []
    prev = num_in
    for h in hidden:
        layers.append(Dense(h, num_in=prev))
        layers.append(activation())
        prev = h
    layers.append(Dense(num_out, num_in=prev))
    return Net(layers)


def build_deep_mlp(num_in=256, depth=100, width=256, num_out=10):
    """Deep-graph autograd stress config (driver config #3): ``depth`` Dense
    layers; exercises long tapes under a single jitted step."""
    layers = []
    prev = num_in
    for _ in range(depth - 1):
        layers.append(Dense(width, num_in=prev))
        layers.append(ReLU())
        prev = width
    layers.append(Dense(num_out, num_in=prev))
    return Net(layers)
