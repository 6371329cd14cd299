"""float64 numpy-oracle micro-checks for primitives not covered by the
ported reference contract (test_autograd.py) or the MLP/CNN oracles."""

import numpy as np
import pytest

import jax.numpy as jnp

from tinynn_autograd_tpu import Tensor, ops


def _rand(*shape, seed=0, scale=1.0):
    rng = np.random.RandomState(seed)
    return np.asarray(rng.randn(*shape) * scale, dtype=np.float32)


def test_abs_grad():
    x = _rand(4, 5)
    t = Tensor(x, requires_grad=True)
    g = _rand(4, 5, seed=1)
    out = ops.abs_(t)
    out.backward(Tensor(g))
    np.testing.assert_allclose(np.asarray(out.data), np.abs(x), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(t.grad), g * np.sign(x),
                               rtol=1e-6)


def test_sqrt_grad():
    x = np.abs(_rand(3, 4)) + 0.5
    t = Tensor(x, requires_grad=True)
    g = _rand(3, 4, seed=2)
    out = ops.sqrt_(t)
    out.backward(Tensor(g))
    x64 = x.astype(np.float64)
    np.testing.assert_allclose(np.asarray(t.grad),
                               g * 0.5 / np.sqrt(x64), rtol=1e-5)


@pytest.mark.parametrize("axis,keepdims", [
    (None, False), (0, False), (1, True), ((0, 2), False), (-1, False),
])
def test_mean_grad_axes(axis, keepdims):
    x = _rand(2, 3, 4)
    t = Tensor(x, requires_grad=True)
    out = ops.mean_(t, axis=axis, keepdims=keepdims)
    g = _rand(*out.shape, seed=3)
    out.backward(Tensor(g))
    x64 = x.astype(np.float64)
    np.testing.assert_allclose(np.asarray(out.data),
                               x64.mean(axis=axis, keepdims=keepdims),
                               rtol=1e-5, atol=1e-7)
    # numerical check of one element via directional perturbation
    eps = 1e-3
    d = np.zeros_like(x)
    d[0, 1, 2] = eps
    f = lambda a: float((a.mean(axis=axis, keepdims=keepdims)
                         * g.astype(np.float64)).sum())
    num = (f(x64 + d) - f(x64 - d)) / (2 * eps)
    np.testing.assert_allclose(np.asarray(t.grad)[0, 1, 2], num,
                               rtol=1e-3, atol=1e-6)


def test_astype_grad_casts_back():
    x = _rand(3, 3)
    t = Tensor(x, requires_grad=True)
    out = ops.astype_(t, jnp.bfloat16)
    assert out.data.dtype == jnp.bfloat16
    out.backward(Tensor(np.ones((3, 3), np.float32)))
    assert np.asarray(t.grad).dtype == np.float32
    np.testing.assert_allclose(np.asarray(t.grad), 1.0)


def test_concat_grads_route_to_each_input():
    a = Tensor(_rand(2, 3), requires_grad=True)
    b = Tensor(_rand(2, 2, seed=5), requires_grad=True)
    c = Tensor(_rand(2, 4, seed=6), requires_grad=False)
    out = ops.concat_([a, b, c], axis=1)
    assert out.shape == (2, 9)
    g = _rand(2, 9, seed=7)
    out.backward(Tensor(g))
    np.testing.assert_allclose(np.asarray(a.grad), g[:, :3], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(b.grad), g[:, 3:5], rtol=1e-6)
    assert c.grad is None


def test_where_grads_select_branches():
    cond = np.array([[True, False], [False, True]])
    a = Tensor(_rand(2, 2), requires_grad=True)
    b = Tensor(_rand(2, 2, seed=8), requires_grad=True)
    out = ops.where(cond, a, b)
    g = _rand(2, 2, seed=9)
    out.backward(Tensor(g))
    np.testing.assert_allclose(np.asarray(a.grad), g * cond, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(b.grad), g * ~cond, rtol=1e-6)


def test_batched_matmul_grads_with_broadcast_batch():
    # [2, 1, 3, 4] @ [5, 4, 2] broadcasts batch dims -> [2, 5, 3, 2];
    # the VJPs must unbroadcast back to each operand's shape
    a = Tensor(_rand(2, 1, 3, 4, scale=0.5), requires_grad=True)
    b = Tensor(_rand(5, 4, 2, seed=10, scale=0.5), requires_grad=True)
    out = a @ b
    assert out.shape == (2, 5, 3, 2)
    g = _rand(2, 5, 3, 2, seed=11)
    out.backward(Tensor(g))

    a64 = np.asarray(a.data, np.float64)
    b64 = np.asarray(b.data, np.float64)
    g64 = g.astype(np.float64)
    want_da = (g64 @ np.swapaxes(b64, -1, -2)).sum(axis=1, keepdims=True)
    want_db = (np.swapaxes(np.broadcast_to(a64, (2, 5, 3, 4)), -1, -2)
               @ g64).sum(axis=0)
    np.testing.assert_allclose(np.asarray(a.grad), want_da, rtol=1e-4,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(b.grad), want_db, rtol=1e-4,
                               atol=1e-6)


def test_matvec_and_vecmat_grads():
    a = Tensor(_rand(3, 4), requires_grad=True)
    v = Tensor(_rand(4, seed=12), requires_grad=True)
    out = a @ v
    assert out.shape == (3,)
    g = _rand(3, seed=13)
    out.backward(Tensor(g))
    np.testing.assert_allclose(np.asarray(a.grad),
                               np.outer(g, np.asarray(v.data)), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(v.grad),
                               np.asarray(a.data).T @ g, rtol=1e-5)
