"""HBM weight-streaming step kernels (ops/streaming_epoch.py), run in
Pallas interpret mode on CPU: must match the scanned-epoch path numerically
for every optimizer family, since the backward kernel re-traces the same
per-leaf update rule (optimizer._step_leaf) the scanned path uses."""

import numpy as np
import pytest

from tinynn_autograd_tpu.models import build_deep_mlp
from tinynn_autograd_tpu.nn.layers import Dense, DenseStack, Dropout, ReLU
from tinynn_autograd_tpu.nn.losses import SoftmaxCrossEntropyLoss
from tinynn_autograd_tpu.nn.model import Model
from tinynn_autograd_tpu.nn.net import Net
from tinynn_autograd_tpu.nn.optimizer import (
    Adadelta, Adagrad, Adam, Momentum, RMSProp, SGD,
)
from tinynn_autograd_tpu.ops import streaming_epoch
from tinynn_autograd_tpu.utils.seeder import random_seed


def _data(n=128, feat=64, classes=10):
    rng = np.random.RandomState(0)
    x = rng.randn(n, feat).astype(np.float32)
    y = np.eye(classes, dtype=np.float32)[rng.randint(0, classes, n)]
    return x, y


def _model(opt, depth=6, width=128, act="relu"):
    random_seed(3)
    net = Net([
        Dense(width, num_in=64), ReLU(),
        DenseStack(depth, width=width, activation=act),
        Dense(10, num_in=width),
    ])
    return Model(net, SoftmaxCrossEntropyLoss(), opt)


@pytest.mark.parametrize("opt_f", [
    lambda: SGD(0.05),
    lambda: Momentum(0.01),
    lambda: Adam(lr=1e-3),
    lambda: Adam(lr=1e-3, weight_decay=1e-4),
    lambda: RMSProp(1e-3),
    lambda: Adagrad(0.05),
    lambda: Adadelta(1.0),
])
def test_streaming_matches_scanned(opt_f):
    x, y = _data()
    m_s = _model(opt_f())
    m_r = _model(opt_f())
    for _ in range(3):
        ls = np.asarray(m_s.train_epoch(x, y, batch_size=32, shuffle=False,
                                        fused="stream"))
        lr = np.asarray(m_r.train_epoch(x, y, batch_size=32, shuffle=False,
                                        fused=False))
        np.testing.assert_allclose(ls, lr, rtol=2e-4, atol=1e-6)


def test_streaming_tanh_body_and_multi_epoch():
    x, y = _data()
    m_s = _model(Adam(1e-3), act="tanh")
    m_r = _model(Adam(1e-3), act="tanh")
    ls = np.asarray(m_s.train_epochs(x, y, n_epochs=3, batch_size=32,
                                     shuffle=False, fused="stream"))
    lr = np.asarray(m_r.train_epochs(x, y, n_epochs=3, batch_size=32,
                                     shuffle=False, fused=False))
    assert ls.shape == (3, 4)
    np.testing.assert_allclose(ls, lr, rtol=2e-4, atol=1e-6)
    # and it actually trains
    assert ls[-1].mean() < ls[0].mean()


def test_streaming_nonuniform_block_sizes():
    # depth=5 is prime vs typical block divisors: exercises C=1/C=5 picks
    x, y = _data()
    m_s = _model(Adam(1e-3), depth=5)
    m_r = _model(Adam(1e-3), depth=5)
    ls = np.asarray(m_s.train_epoch(x, y, batch_size=64, shuffle=False,
                                    fused="stream"))
    lr = np.asarray(m_r.train_epoch(x, y, batch_size=64, shuffle=False,
                                    fused=False))
    np.testing.assert_allclose(ls, lr, rtol=2e-4, atol=1e-6)


def test_streaming_supports_eligibility():
    opt = Adam(1e-3)
    ok = Net([Dense(128, num_in=64), ReLU(),
              DenseStack(4, width=128), Dense(10, num_in=128)])
    assert streaming_epoch.supports(ok, None, opt)

    # no DenseStack
    assert not streaming_epoch.supports(
        Net([Dense(128, num_in=64), ReLU(), Dense(10, num_in=128)]),
        None, opt)
    # two stacks
    assert not streaming_epoch.supports(
        Net([DenseStack(2, width=128), DenseStack(2, width=128)]),
        None, opt)
    # width not MXU-tileable
    assert not streaming_epoch.supports(
        Net([Dense(100, num_in=64), DenseStack(4, width=100),
             Dense(10, num_in=100)]), None, opt)
    # unsupported companion layer
    assert not streaming_epoch.supports(
        Net([Dense(128, num_in=64), Dropout(0.5),
             DenseStack(4, width=128), Dense(10, num_in=128)]),
        None, opt)


def test_streaming_via_deep_mlp_builder():
    x, y = _data(feat=64)
    random_seed(5)
    m_s = Model(build_deep_mlp(num_in=64, depth=8, width=128, num_out=10,
                               stacked=True),
                SoftmaxCrossEntropyLoss(), SGD(0.05))
    random_seed(5)
    m_r = Model(build_deep_mlp(num_in=64, depth=8, width=128, num_out=10,
                               stacked=True),
                SoftmaxCrossEntropyLoss(), SGD(0.05))
    ls = np.asarray(m_s.train_epoch(x, y, batch_size=32, shuffle=False,
                                    fused="stream"))
    lr = np.asarray(m_r.train_epoch(x, y, batch_size=32, shuffle=False,
                                    fused=False))
    np.testing.assert_allclose(ls, lr, rtol=2e-4, atol=1e-6)


def test_streaming_with_lr_schedule_matches_scanned():
    from tinynn_autograd_tpu.nn.scheduler import WarmupCosineLR

    def opt():
        from tinynn_autograd_tpu.nn.optimizer import Adam

        return Adam(lr=WarmupCosineLR(lr=1e-2, warmup_steps=4,
                               decay_steps=24))

    x, y = _data()
    m_s = _model(opt())
    m_r = _model(opt())
    for _ in range(3):
        ls = np.asarray(m_s.train_epoch(x, y, batch_size=32, shuffle=False,
                                        fused="stream"))
        lr = np.asarray(m_r.train_epoch(x, y, batch_size=32, shuffle=False,
                                        fused=False))
        np.testing.assert_allclose(ls, lr, rtol=2e-4, atol=1e-6)


def test_bf16_slot_storage_streams_and_converges():
    """Opt-in bf16 moment storage (slot_dtype): halves the slot HBM
    traffic that bounds Adam on the streaming path (BENCHMARKS.md walls).
    Update math stays f32; stored moments are rounded — so we assert
    convergence tracks an f32 twin, not bit parity."""
    import jax.numpy as jnp

    x, y = _data()
    m16 = _model(Adam(lr=1e-2, slot_dtype=jnp.bfloat16))
    m32 = _model(Adam(lr=1e-2))
    l16 = np.asarray(m16.train_epochs(x, y, n_epochs=15, batch_size=64,
                                      shuffle=False, fused="stream"))
    l32 = np.asarray(m32.train_epochs(x, y, n_epochs=15, batch_size=64,
                                      shuffle=False, fused="stream"))
    assert np.isfinite(l16).all()
    assert l16[-1, -1] < l16[0, 0] * 0.5          # converges
    # bf16 moments LAG the f32 twin (round-to-nearest EMA loses sub-2^-8
    # relative increments, so Adam's v stalls at small lr*g — the known
    # cost of the mode; stochastic rounding would close it): assert only
    # that the f32 twin is at least as good and both keep descending
    assert l32[-1, -1] <= l16[-1, -1] + 1e-3
    # the stack's moment leaves are actually stored in bf16
    stack_idx = streaming_epoch._find_stack(m16.net)
    mslot = m16._opt_state["slots"]["m"][stack_idx]["w"]
    assert mslot.dtype == jnp.bfloat16
    # fused per-step path uses the same storage dtype
    m2 = _model(Adam(lr=1e-2, slot_dtype=jnp.bfloat16))
    m2.train_step(x[:64], y[:64])
    assert m2._opt_state["slots"]["v"][stack_idx]["w"].dtype == jnp.bfloat16


def test_bf16_slots_excluded_from_megakernel():
    import jax.numpy as jnp

    from tinynn_autograd_tpu.ops import fused_epoch

    random_seed(5)
    net = Net([Dense(32, num_in=16), ReLU(), Dense(10, num_in=32)])
    net.init((8, 16))
    ok32 = fused_epoch.supports(net, net.params_tree(), Adam(1e-3))
    ok16 = fused_epoch.supports(net, net.params_tree(),
                                Adam(1e-3, slot_dtype=jnp.bfloat16))
    assert ok32 and not ok16
