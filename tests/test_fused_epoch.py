"""Fused-epoch Pallas megakernel (interpret mode on CPU): must match the
scanned-epoch path numerically — same tape, same optimizer, different
execution tier."""

import numpy as np
import pytest

from tinynn_autograd_tpu import Tensor

from tinynn_autograd_tpu.nn.layers import Dense, ReLU, Sigmoid
from tinynn_autograd_tpu.nn.losses import MSELoss, SoftmaxCrossEntropyLoss
from tinynn_autograd_tpu.nn.model import Model
from tinynn_autograd_tpu.nn.net import Net
from tinynn_autograd_tpu.nn.optimizer import Adam, Momentum, SGD
from tinynn_autograd_tpu.utils.seeder import random_seed


def _toy(seed, opt):
    random_seed(seed)
    net = Net([Dense(16, num_in=8), ReLU(), Dense(4, num_in=16)])
    return Model(net, SoftmaxCrossEntropyLoss(), opt)


def _data(n=64):
    rng = np.random.RandomState(0)
    x = rng.randn(n, 8).astype(np.float32)
    y = np.eye(4, dtype=np.float32)[rng.randint(0, 4, n)]
    return x, y


@pytest.mark.parametrize("make_opt", [
    lambda: SGD(lr=0.05),
    lambda: Momentum(lr=0.05, momentum=0.9),
    lambda: Adam(lr=1e-2),
], ids=["sgd", "momentum", "adam"])
def test_fused_epoch_matches_scan(make_opt):
    x, y = _data(64)
    m_fused = _toy(1, make_opt())
    m_scan = _toy(1, make_opt())

    for _ in range(2):
        lf = m_fused.train_epoch(x, y, batch_size=16, shuffle=False,
                                 fused=True)
        ls = m_scan.train_epoch(x, y, batch_size=16, shuffle=False,
                                fused=False)
    np.testing.assert_allclose(np.asarray(lf), np.asarray(ls),
                               rtol=1e-4, atol=1e-5)
    for layer_f, layer_s in zip(m_fused._params, m_scan._params):
        for k in layer_f:
            np.testing.assert_allclose(
                np.asarray(layer_f[k]), np.asarray(layer_s[k]),
                rtol=1e-4, atol=1e-5)
    # optimizer step counters advanced identically
    assert int(m_fused._opt_state["t"]) == int(m_scan._opt_state["t"]) == 8


def test_fused_epoch_with_shuffle_runs():
    x, y = _data(64)
    model = _toy(2, Adam(lr=1e-2))
    losses = model.train_epoch(x, y, batch_size=16, fused=True)
    assert losses.shape == (4,)
    assert np.isfinite(np.asarray(losses)).all()


def test_fused_epoch_then_scan_interop():
    # switching tiers mid-training keeps params/opt state coherent
    x, y = _data(64)
    model = _toy(3, Adam(lr=1e-2))
    model.train_epoch(x, y, batch_size=16, fused=True)
    losses = model.train_epoch(x, y, batch_size=16, fused=False)
    assert np.isfinite(np.asarray(losses)).all()
    assert int(model._opt_state["t"]) == 8


def test_supports_gating():
    from tinynn_autograd_tpu.nn.layers import Conv2D, Dropout
    from tinynn_autograd_tpu.ops import fused_epoch

    net = Net([Dense(4, num_in=8), Sigmoid()])
    net.init((16, 8))
    assert fused_epoch.supports(net, net.params_tree(), Adam())

    # dropout is supported (TPU core PRNG inside the kernel)
    net2 = Net([Dense(4, num_in=8), Dropout(0.5)])
    net2.init((16, 8))
    assert fused_epoch.supports(net2, net2.params_tree(), Adam())

    # convs are not (lax conv can't lower inside a Pallas kernel)
    net3 = Net([Conv2D(kernel=(3, 3, 1, 4))])
    net3.init((4, 8, 8, 1))
    assert not fused_epoch.supports(net3, net3.params_tree(), Adam())

    # oversized params fall back too
    net4 = Net([Dense(4096, num_in=4096)])
    net4.init((16, 4096))
    assert not fused_epoch.supports(net4, net4.params_tree(), Adam())


def test_pltpu_seed_marker_dropout_statistics():
    """The megakernel dropout path (('pltpu_seed', t, interpret) marker):
    keep-rate within statistical tolerance, survivors scaled by 1/keep,
    gradient masked identically to the forward."""
    from tinynn_autograd_tpu.ops.primitives import dropout_

    rate = 0.4
    x = np.ones((64, 256), np.float32)
    t = Tensor(x, requires_grad=True)
    out = dropout_(t, rate, ("pltpu_seed", 7, True))
    vals = np.asarray(out.data)
    kept = vals != 0.0
    keep_frac = kept.mean()
    assert abs(keep_frac - (1 - rate)) < 0.02, keep_frac
    # survivors are exactly scaled by 1/keep
    np.testing.assert_allclose(vals[kept], 1.0 / (1 - rate), rtol=1e-6)
    # backward uses the SAME mask
    out.backward(Tensor(np.ones_like(x)))
    g = np.asarray(t.grad)
    np.testing.assert_array_equal(g != 0.0, kept)
    # different seeds give different masks
    out2 = dropout_(Tensor(x), rate, ("pltpu_seed", 8, True))
    assert (np.asarray(out2.data) != vals).any()


def test_fused_epoch_with_dropout_interpret():
    """Megakernel + Dropout end-to-end in interpret mode: trains, loss
    drops, and the mask refreshes per step (losses vary while params near
    fixed under lr=0)."""
    from tinynn_autograd_tpu.nn.layers import Dropout

    random_seed(11)
    net = Net([Dense(32, num_in=16), ReLU(), Dropout(0.3),
               Dense(4, num_in=32)])
    model = Model(net, SoftmaxCrossEntropyLoss(), Adam(lr=1e-2))
    rng = np.random.RandomState(0)
    x = rng.randn(128, 16).astype(np.float32)
    y = np.eye(4, dtype=np.float32)[rng.randint(0, 4, 128)]
    first = None
    for _ in range(30):
        losses = np.asarray(model.train_epoch(x, y, batch_size=32,
                                              fused=True))
        assert np.isfinite(losses).all()
        first = losses.mean() if first is None else first
    assert losses.mean() < first * 0.8


def test_fused_epoch_with_layer_norm_matches_scanned():
    from tinynn_autograd_tpu.nn.layers import LayerNorm

    def mk():
        random_seed(13)
        net = Net([Dense(32, num_in=16), LayerNorm(dim=32), ReLU(),
                   Dense(4, num_in=32)])
        return Model(net, SoftmaxCrossEntropyLoss(), Adam(lr=1e-2))

    rng = np.random.RandomState(0)
    x = rng.randn(64, 16).astype(np.float32)
    y = np.eye(4, dtype=np.float32)[rng.randint(0, 4, 64)]
    m_f, m_s = mk(), mk()
    for _ in range(3):
        lf = np.asarray(m_f.train_epoch(x, y, batch_size=16, shuffle=False,
                                        fused=True))
        ls = np.asarray(m_s.train_epoch(x, y, batch_size=16, shuffle=False,
                                        fused=False))
        np.testing.assert_allclose(lf, ls, rtol=2e-4, atol=1e-6)
