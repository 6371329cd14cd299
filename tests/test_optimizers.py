"""Optimizer unit tests: each update rule against a hand-rolled numpy
twin of the reference's flat-vector math (reference: core/optimizer.py) —
per-leaf pytree updates must be numerically identical to the reference's
flatten-everything approach since all rules are elementwise."""

import numpy as np

from tinynn_autograd_tpu import Tensor
from tinynn_autograd_tpu.nn.optimizer import (
    Adadelta, Adagrad, Adam, Momentum, RMSProp, SGD,
)
from tinynn_autograd_tpu.nn.scheduler import CosineDecayLR, StepDecayLR


def _run(opt, grads_seq):
    """Feed a sequence of gradient values through the facade; returns the
    per-call steps. Params: single 2-vector."""
    outs = []
    for g in grads_seq:
        params = [{"w": Tensor(np.zeros(2, np.float32))}]
        grads = [{"w": np.asarray(g, np.float32)}]
        steps = opt.compute_step(grads, params)
        outs.append(np.asarray(steps[0]["w"]))
    return outs


def test_sgd():
    steps = _run(SGD(lr=0.1), [[1.0, -2.0]])
    np.testing.assert_allclose(steps[0], [-0.1, 0.2], rtol=1e-6)


def test_momentum():
    g = np.array([1.0, 1.0])
    steps = _run(Momentum(lr=0.1, momentum=0.9), [g, g])
    np.testing.assert_allclose(steps[0], -0.1 * g, rtol=1e-6)
    np.testing.assert_allclose(steps[1], -0.1 * (0.9 * g + g), rtol=1e-6)


def test_adam_matches_numpy_twin():
    lr, b1, b2, eps = 0.01, 0.9, 0.999, 1e-8
    opt = Adam(lr=lr, beta1=b1, beta2=b2, epsilon=eps)
    rng = np.random.RandomState(0)
    gs = [rng.randn(2).astype(np.float32) for _ in range(5)]

    m = np.zeros(2)
    v = np.zeros(2)
    for t, (g, step) in enumerate(zip(gs, _run(opt, gs)), start=1):
        m += (1 - b1) * (g - m)
        v += (1 - b2) * (g ** 2 - v)
        m_hat = m / (1 - b1 ** t)
        v_hat = v / (1 - b2 ** t)
        expected = -lr * m_hat / (np.sqrt(v_hat) + eps)
        np.testing.assert_allclose(step, expected, rtol=1e-4, atol=1e-7)


def test_rmsprop_matches_numpy_twin():
    lr, decay, mom_c, eps = 0.01, 0.99, 0.5, 1e-8
    opt = RMSProp(lr=lr, decay=decay, momentum=mom_c, epsilon=eps)
    rng = np.random.RandomState(1)
    gs = [rng.randn(2).astype(np.float32) for _ in range(4)]

    ms = np.zeros(2)
    mom = np.zeros(2)
    for g, step in zip(gs, _run(opt, gs)):
        ms += (1 - decay) * (g ** 2 - ms)
        mom = mom_c * mom + lr * g / np.sqrt(ms + eps)
        np.testing.assert_allclose(step, -mom, rtol=1e-4, atol=1e-7)


def test_adagrad_matches_numpy_twin():
    lr, eps = 0.1, 1e-8
    opt = Adagrad(lr=lr, epsilon=eps)
    gs = [np.array([1.0, 2.0], np.float32), np.array([2.0, 1.0], np.float32)]
    G = np.zeros(2)
    for g, step in zip(gs, _run(opt, gs)):
        G += g ** 2
        np.testing.assert_allclose(step, -(lr / np.sqrt(G + eps)) * g,
                                   rtol=1e-5, atol=1e-7)


def test_adadelta_matches_numpy_twin():
    lr, decay, eps = 1.0, 0.9, 1e-8
    opt = Adadelta(lr=lr, decay=decay, epsilon=eps)
    rng = np.random.RandomState(2)
    gs = [rng.randn(2).astype(np.float32) for _ in range(3)]
    Eg = np.zeros(2)
    d = np.zeros(2)
    for g, step in zip(gs, _run(opt, gs)):
        Eg += (1 - decay) * (g ** 2 - Eg)
        delta = g * np.sqrt(d + eps) / np.sqrt(Eg + eps)
        expected = -lr * delta
        d += (1 - decay) * (delta ** 2 - d)
        np.testing.assert_allclose(step, expected, rtol=1e-4, atol=1e-7)


def test_weight_decay_applied():
    # step = -lr*g - wd*param (the rule the reference comments out,
    # reference core/optimizer.py:29-30)
    opt = SGD(lr=0.1, weight_decay=0.01)
    params = [{"w": Tensor(np.array([10.0, -10.0], np.float32))}]
    grads = [{"w": np.array([1.0, 1.0], np.float32)}]
    steps = opt.compute_step(grads, params)
    np.testing.assert_allclose(
        np.asarray(steps[0]["w"]), [-0.1 - 0.1, -0.1 + 0.1],
        rtol=1e-5, atol=1e-7)


def test_multi_layer_structure_preserved():
    opt = Adam(lr=0.001)
    params = [
        {"w": Tensor(np.zeros((3, 2), np.float32)),
         "b": Tensor(np.zeros((1, 2), np.float32))},
        {},
        {"w": Tensor(np.zeros((2, 1), np.float32))},
    ]
    grads = [
        {"w": np.ones((3, 2), np.float32), "b": np.ones((1, 2), np.float32)},
        {},
        {"w": np.ones((2, 1), np.float32)},
    ]
    steps = opt.compute_step(grads, params)
    assert steps[0]["w"].shape == (3, 2)
    assert steps[0]["b"].shape == (1, 2)
    assert steps[1] == {}
    assert steps[2]["w"].shape == (2, 1)


def test_lr_schedule():
    sched = StepDecayLR(lr=1.0, step_size=2, gamma=0.1)
    opt = SGD(lr=sched)
    g = [np.array([1.0, 1.0], np.float32)] * 5
    steps = _run(opt, g)
    # t = 1..5; floor(t/2) = 0,1,1,2,2
    np.testing.assert_allclose(steps[0], [-1.0, -1.0], rtol=1e-5)
    np.testing.assert_allclose(steps[1], [-0.1, -0.1], rtol=1e-5)
    np.testing.assert_allclose(steps[4], [-0.01, -0.01], rtol=1e-5)


def test_cosine_schedule_endpoints():
    sched = CosineDecayLR(lr=1.0, decay_steps=100, alpha=0.1)
    import jax.numpy as jnp

    assert abs(float(sched(jnp.asarray(0))) - 1.0) < 1e-6
    assert abs(float(sched(jnp.asarray(100))) - 0.1) < 1e-6


def test_step_leaf_preserves_dtypes_without_override():
    """Review r3 finding: step_leaf upcasts slots to f32 for the math but
    must hand back slots in their INPUT dtype (stable lax.scan carries for
    non-f32 params) and the step in the gradient's dtype."""
    import jax.numpy as jnp

    from tinynn_autograd_tpu.nn.optimizer import Momentum

    opt = Momentum(0.1)
    g = jnp.ones((4,), jnp.bfloat16)
    slots = {"acc": jnp.zeros((4,), jnp.bfloat16)}
    step, new = opt.step_leaf(g, 0.1, jnp.zeros((), jnp.int32), slots)
    assert new["acc"].dtype == jnp.bfloat16
    assert step.dtype == jnp.bfloat16
    # and f32 in -> f32 out, unchanged math
    g32 = jnp.ones((4,), jnp.float32)
    step32, new32 = opt.step_leaf(g32, 0.1, jnp.zeros((), jnp.int32),
                                  {"acc": jnp.zeros((4,), jnp.float32)})
    assert new32["acc"].dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(step32), -0.1 * np.ones(4),
                               rtol=1e-6)
