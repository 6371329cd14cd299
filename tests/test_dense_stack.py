"""DenseStack (scan-over-layers primitive): numerics must exactly match the
equivalent stack of individual Dense layers, forward and backward."""

import numpy as np
import pytest

import tinynn_autograd_tpu.ops as ops
from tinynn_autograd_tpu import Tensor
from tinynn_autograd_tpu.nn.layers import Dense, DenseStack, ReLU, Tanh
from tinynn_autograd_tpu.nn.losses import SoftmaxCrossEntropyLoss
from tinynn_autograd_tpu.nn.model import Model
from tinynn_autograd_tpu.nn.net import Net
from tinynn_autograd_tpu.nn.optimizer import Adam, SGD
from tinynn_autograd_tpu.utils.seeder import random_seed


@pytest.mark.parametrize("activation,act_layer", [
    ("relu", ReLU), ("tanh", Tanh)])
def test_dense_stack_matches_layer_stack(activation, act_layer):
    rng = np.random.RandomState(0)
    L, B, W = 4, 8, 16
    ws = (rng.randn(L, W, W) * 0.3).astype(np.float32)
    bs = (rng.randn(L, 1, W) * 0.1).astype(np.float32)
    x = rng.randn(B, W).astype(np.float32)
    g = rng.randn(B, W).astype(np.float32)

    # stacked primitive
    tx = Tensor(x, requires_grad=True)
    tw = Tensor(ws, requires_grad=True)
    tb = Tensor(bs, requires_grad=True)
    out = ops.dense_stack_(tx, tw, tb, activation=activation)
    out.backward(g)

    # individual layers
    tx2 = Tensor(x, requires_grad=True)
    h = tx2
    layer_ws, layer_bs = [], []
    for l in range(L):
        w = Tensor(ws[l], requires_grad=True)
        b = Tensor(bs[l], requires_grad=True)
        layer_ws.append(w)
        layer_bs.append(b)
        h = act_layer().forward(h @ w + b)
    h.backward(g)

    np.testing.assert_allclose(out.numpy(), h.numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(tx.grad), np.asarray(tx2.grad),
                               rtol=1e-5, atol=1e-6)
    for l in range(L):
        np.testing.assert_allclose(
            np.asarray(tw.grad)[l], np.asarray(layer_ws[l].grad),
            rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(tb.grad)[l], np.asarray(layer_bs[l].grad),
            rtol=1e-5, atol=1e-6)


def test_dense_stack_layer_trains():
    random_seed(0)
    rng = np.random.RandomState(0)
    x = rng.randn(32, 16).astype(np.float32)
    y = np.eye(4, dtype=np.float32)[rng.randint(0, 4, 32)]
    net = Net([Dense(16, num_in=16), ReLU(),
               DenseStack(6, width=16), Dense(4, num_in=16)])
    model = Model(net, SoftmaxCrossEntropyLoss(), Adam(lr=1e-2))
    losses = [float(model.train_step(x, y)) for _ in range(60)]
    assert losses[-1] < losses[0] * 0.5


def test_dense_stack_lazy_init_and_shapes():
    stack = DenseStack(3)
    assert not stack.is_init
    out = stack.forward(Tensor(np.ones((4, 8), np.float32)))
    assert stack.is_init
    assert tuple(stack.params["w"].shape) == (3, 8, 8)
    assert tuple(stack.params["b"].shape) == (3, 1, 8)
    assert out.shape == (4, 8)


def test_stacked_deep_mlp_builder_trains():
    from tinynn_autograd_tpu.models import build_deep_mlp

    random_seed(1)
    net = build_deep_mlp(num_in=8, depth=12, width=16, num_out=4,
                         stacked=True)
    model = Model(net, SoftmaxCrossEntropyLoss(), SGD(lr=0.02))
    rng = np.random.RandomState(0)
    x = rng.randn(16, 8).astype(np.float32)
    y = np.eye(4, dtype=np.float32)[rng.randint(0, 4, 16)]
    losses = np.asarray(model.train_epoch(x, y, batch_size=16, shuffle=False))
    assert np.isfinite(losses).all()


def test_dense_stack_double_backward_fresh_grads():
    """Regression for the backward memo: a SECOND backward through the same
    forward graph with a different cotangent must produce that cotangent's
    gradients, not a stale cached result (the round-1 cache keyed on id()
    could alias a freed object's reused id)."""
    import gc

    from tinynn_autograd_tpu.ops.primitives import dense_stack_

    rng = np.random.RandomState(0)
    x = rng.randn(4, 8).astype(np.float32)
    w = (rng.randn(3, 8, 8) * 0.3).astype(np.float32)
    b = (rng.randn(3, 1, 8) * 0.1).astype(np.float32)

    def run_once(gout):
        tx = Tensor(x, requires_grad=True)
        tw = Tensor(w, requires_grad=True)
        tb = Tensor(b, requires_grad=True)
        out = dense_stack_(tx, tw, tb, "tanh")
        out.backward(Tensor(gout))
        return (np.asarray(tx.grad), np.asarray(tw.grad),
                np.asarray(tb.grad))

    g1 = rng.randn(4, 8).astype(np.float32)
    g2 = rng.randn(4, 8).astype(np.float32)
    want1, want_w1, want_b1 = run_once(g1)
    want2, want_w2, want_b2 = run_once(g2)

    # same graph, two backwards with zero_grad between; force gc so a stale
    # id-keyed cache would have the chance to alias
    tx = Tensor(x, requires_grad=True)
    tw = Tensor(w, requires_grad=True)
    tb = Tensor(b, requires_grad=True)
    out = dense_stack_(tx, tw, tb, "tanh")
    out.backward(Tensor(g1))
    np.testing.assert_allclose(np.asarray(tw.grad), want_w1,
                               rtol=1e-5, atol=1e-6)
    for t in (tx, tw, tb):
        t.zero_grad()
    gc.collect()
    out.backward(Tensor(g2))
    np.testing.assert_allclose(np.asarray(tx.grad), want2,
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(tw.grad), want_w2,
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(tb.grad), want_b2,
                               rtol=1e-5, atol=1e-6)
