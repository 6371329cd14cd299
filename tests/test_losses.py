"""Loss tests — the reference has none (SURVEY.md §4), which is how its
global-softmax bug survived. Softmax-CE here must be the standard per-row
stable formulation with analytically known gradient (softmax(p) - y) / m."""

import numpy as np

from tinynn_autograd_tpu import Tensor
from tinynn_autograd_tpu.nn.losses import (
    HuberLoss, MAELoss, MSELoss, SigmoidCrossEntropyLoss,
    SoftmaxCrossEntropyLoss,
)


def _softmax(x):
    e = np.exp(x - x.max(axis=1, keepdims=True))
    return e / e.sum(axis=1, keepdims=True)


def test_softmax_ce_value():
    logits = np.array([[2.0, 1.0, 0.1], [0.5, 2.5, 0.3]], np.float32)
    labels = np.array([[1, 0, 0], [0, 1, 0]], np.float32)
    loss = SoftmaxCrossEntropyLoss().loss(Tensor(logits), Tensor(labels))
    p = _softmax(logits)
    expected = -np.mean(np.log(p[np.arange(2), [0, 1]]))
    np.testing.assert_allclose(float(loss.values), expected, rtol=1e-6)


def test_softmax_ce_grad_closed_form():
    rng = np.random.RandomState(0)
    logits = rng.randn(8, 5).astype(np.float32)
    y_idx = rng.randint(0, 5, 8)
    labels = np.eye(5, dtype=np.float32)[y_idx]

    t = Tensor(logits, requires_grad=True)
    loss = SoftmaxCrossEntropyLoss().loss(t, Tensor(labels))
    loss.backward()
    expected = (_softmax(logits) - labels) / 8
    np.testing.assert_allclose(np.asarray(t.grad), expected, rtol=1e-5, atol=1e-6)


def test_softmax_ce_per_row_not_global():
    # the reference's global max/sum formulation gives 1.018 on this case
    # (SURVEY.md §2.3); the correct per-row value differs
    logits = np.array([[10.0, 0.0, 0.0], [0.0, 10.0, 0.0]], np.float32)
    labels = np.array([[1, 0, 0], [0, 1, 0]], np.float32)
    loss = SoftmaxCrossEntropyLoss().loss(Tensor(logits), Tensor(labels))
    per_row = -np.log(_softmax(logits)[[0, 1], [0, 1]]).mean()
    np.testing.assert_allclose(float(loss.values), per_row, rtol=1e-4, atol=1e-7)


def test_softmax_ce_class_weights():
    # per-class weights scale each sample's nll by its true-class weight
    # (working version of the reference's broken weight path,
    # reference core/losses.py:30-31)
    logits = np.array([[1.0, 0.0], [0.0, 1.0]], np.float32)
    labels = np.array([[1, 0], [0, 1]], np.float32)
    w = np.array([2.0, 0.5], np.float32)
    loss = SoftmaxCrossEntropyLoss(weight=w).loss(Tensor(logits), Tensor(labels))
    p = _softmax(logits)
    nll = -np.log(p[[0, 1], [0, 1]])
    expected = (2.0 * nll[0] + 0.5 * nll[1]) / 2
    np.testing.assert_allclose(float(loss.values), expected, rtol=1e-6)


def test_mse_loss():
    pred = Tensor(np.array([[1.0, 2.0], [3.0, 4.0]], np.float32), requires_grad=True)
    target = Tensor(np.array([[0.0, 0.0], [0.0, 0.0]], np.float32))
    loss = MSELoss().loss(pred, target)
    np.testing.assert_allclose(float(loss.values), (1 + 4 + 9 + 16) / 2, rtol=1e-6)
    loss.backward()
    np.testing.assert_allclose(np.asarray(pred.grad), [[1.0, 2.0], [3.0, 4.0]], rtol=1e-6)


def test_mae_loss():
    pred = Tensor(np.array([[1.0, -2.0]], np.float32))
    target = Tensor(np.array([[0.0, 0.0]], np.float32))
    loss = MAELoss().loss(pred, target)
    np.testing.assert_allclose(float(loss.values), 3.0, rtol=1e-6)


def test_huber_loss():
    pred = Tensor(np.array([[0.5, 3.0]], np.float32), requires_grad=True)
    target = Tensor(np.array([[0.0, 0.0]], np.float32))
    loss = HuberLoss(delta=1.0).loss(pred, target)
    expected = (0.5 * 0.25) + (3.0 - 0.5)
    np.testing.assert_allclose(float(loss.values), expected, rtol=1e-6)
    loss.backward()
    np.testing.assert_allclose(np.asarray(pred.grad), [[0.5, 1.0]], rtol=1e-6)


def test_sigmoid_ce():
    logits = np.array([[2.0], [-1.0]], np.float32)
    labels = np.array([[1.0], [0.0]], np.float32)
    loss = SigmoidCrossEntropyLoss().loss(Tensor(logits), Tensor(labels))
    p = 1 / (1 + np.exp(-logits))
    expected = -np.mean(labels * np.log(p) + (1 - labels) * np.log(1 - p)) * 1
    np.testing.assert_allclose(float(loss.values), expected, rtol=1e-5)
