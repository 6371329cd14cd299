"""Driver north-star metric: tape gradients vs an independent float64 numpy
oracle, element-wise <= 1e-5 (BASELINE.json "grad parity <=1e-5 vs numpy").

The oracle is a closed-form hand derivation of the MLP's backward pass
(standard chain rule in float64), written independently of both the
framework and the reference implementation.
"""

import numpy as np

from tinynn_autograd_tpu import Tensor
from tinynn_autograd_tpu.nn.layers import Dense, ReLU
from tinynn_autograd_tpu.nn.losses import SoftmaxCrossEntropyLoss
from tinynn_autograd_tpu.nn.net import Net


def _oracle_mlp_grads(x, ws, bs, labels):
    """float64 forward + closed-form backward for a Dense/ReLU stack with
    per-row softmax cross-entropy (mean over batch)."""
    x = x.astype(np.float64)
    acts = [x]
    pre = []
    h = x
    for i, (w, b) in enumerate(zip(ws, bs)):
        z = h @ w.astype(np.float64) + b.astype(np.float64)
        pre.append(z)
        h = np.maximum(z, 0.0) if i < len(ws) - 1 else z
        acts.append(h)
    logits = acts[-1]
    m = logits.shape[0]
    p = np.exp(logits - logits.max(axis=1, keepdims=True))
    p /= p.sum(axis=1, keepdims=True)

    dz = (p - labels.astype(np.float64)) / m
    dws, dbs = [], []
    for i in reversed(range(len(ws))):
        h_in = acts[i]
        dws.append(h_in.T @ dz)
        dbs.append(dz.sum(axis=0, keepdims=True))
        if i > 0:
            dh = dz @ ws[i].astype(np.float64).T
            # relu subgradient: 1 at 0 (framework/reference convention);
            # measure-zero in float64 random data either way
            dz = dh * (pre[i - 1] >= 0.0)
    return list(reversed(dws)), list(reversed(dbs))


def test_mlp_grads_match_numpy_oracle_1e5():
    rng = np.random.RandomState(0)
    sizes = [20, 16, 12, 4]
    ws = [rng.randn(a, b).astype(np.float32) * 0.4
          for a, b in zip(sizes[:-1], sizes[1:])]
    bs = [rng.randn(1, b).astype(np.float32) * 0.1 for b in sizes[1:]]
    x = rng.randn(32, sizes[0]).astype(np.float32)
    labels = np.eye(sizes[-1], dtype=np.float32)[
        rng.randint(0, sizes[-1], 32)]

    layers = []
    for i, (w, b) in enumerate(zip(ws, bs)):
        d = Dense(w.shape[1], num_in=w.shape[0])
        d.params["w"] = Tensor(w, requires_grad=True)
        d.params["b"] = Tensor(b, requires_grad=True)
        layers.append(d)
        if i < len(ws) - 1:
            layers.append(ReLU())
    net = Net(layers)

    loss = SoftmaxCrossEntropyLoss().loss(
        net.forward(Tensor(x)), Tensor(labels))
    loss.backward()

    dws, dbs = _oracle_mlp_grads(x, ws, bs, labels)
    dense_layers = [l for l in net.layers if isinstance(l, Dense)]
    for layer, dw, db in zip(dense_layers, dws, dbs):
        got_w = np.asarray(layer.params["w"].grad, dtype=np.float64)
        got_b = np.asarray(layer.params["b"].grad, dtype=np.float64)
        assert np.max(np.abs(got_w - dw)) <= 1e-5, np.max(np.abs(got_w - dw))
        assert np.max(np.abs(got_b - db)) <= 1e-5, np.max(np.abs(got_b - db))


def test_input_grad_matches_oracle():
    rng = np.random.RandomState(1)
    w = rng.randn(8, 3).astype(np.float32) * 0.5
    b = np.zeros((1, 3), np.float32)
    x = rng.randn(16, 8).astype(np.float32)
    labels = np.eye(3, dtype=np.float32)[rng.randint(0, 3, 16)]

    d = Dense(3, num_in=8)
    d.params["w"] = Tensor(w, requires_grad=True)
    d.params["b"] = Tensor(b, requires_grad=True)
    xt = Tensor(x, requires_grad=True)
    loss = SoftmaxCrossEntropyLoss().loss(d.forward(xt), Tensor(labels))
    loss.backward()

    logits = x.astype(np.float64) @ w.astype(np.float64)
    p = np.exp(logits - logits.max(axis=1, keepdims=True))
    p /= p.sum(axis=1, keepdims=True)
    dx = ((p - labels) / 16) @ w.astype(np.float64).T
    assert np.max(np.abs(np.asarray(xt.grad, np.float64) - dx)) <= 1e-5


def _np_conv_same(x, w):
    """float64 NHWC 'SAME' stride-1 conv oracle."""
    n, h, wd, ci = x.shape
    kh, kw, _, co = w.shape
    ph, pw = kh // 2, kw // 2
    xp = np.pad(x, ((0, 0), (ph, ph), (pw, pw), (0, 0)))
    out = np.zeros((n, h, wd, co))
    for i in range(kh):
        for j in range(kw):
            out += np.einsum("nhwc,cf->nhwf",
                             xp[:, i:i + h, j:j + wd, :], w[i, j])
    return out


def test_cnn_grads_match_numpy_oracle():
    """Driver north-star, conv edition: conv -> relu -> 2x2 maxpool ->
    flatten -> dense -> softmax-CE grads vs an independent float64 numpy
    chain-rule oracle, element-wise <= 1e-5."""
    from tinynn_autograd_tpu.nn.layers import (
        Conv2D, Dense, Flatten, MaxPool2D, ReLU,
    )
    from tinynn_autograd_tpu.nn.losses import SoftmaxCrossEntropyLoss

    rng = np.random.RandomState(0)
    N, H, W, CI, CO, K = 4, 8, 8, 2, 3, 3
    x = rng.randn(N, H, W, CI).astype(np.float32) * 0.5
    wk = (rng.randn(K, K, CI, CO) * 0.3).astype(np.float32)
    bk = (rng.randn(1, CO) * 0.1).astype(np.float32)
    F = (H // 2) * (W // 2) * CO
    wd_ = (rng.randn(F, 5) * 0.2).astype(np.float32)
    bd = (rng.randn(1, 5) * 0.1).astype(np.float32)
    labels = np.eye(5, dtype=np.float32)[rng.randint(0, 5, N)]

    conv = Conv2D((K, K, CI, CO), stride=1, padding="SAME")
    conv.params["w"] = Tensor(wk, requires_grad=True)
    conv.params["b"] = Tensor(bk, requires_grad=True)
    dense = Dense(5, num_in=F)
    dense.params["w"] = Tensor(wd_, requires_grad=True)
    dense.params["b"] = Tensor(bd, requires_grad=True)
    net = Net([conv, ReLU(), MaxPool2D(2), Flatten(), dense])
    loss_t = SoftmaxCrossEntropyLoss().loss(
        net.forward(Tensor(x)), Tensor(labels))
    loss_t.backward()

    # ---- float64 oracle ----
    x64 = x.astype(np.float64)
    z1 = _np_conv_same(x64, wk.astype(np.float64)) + bk.reshape(1, 1, 1, CO)
    a1 = np.maximum(z1, 0.0)
    # 2x2/2 maxpool
    win = np.stack([a1[:, i::2, j::2, :] for i in range(2)
                    for j in range(2)], axis=0)       # [4,N,H/2,W/2,CO]
    pooled = win.max(axis=0)
    flat = pooled.reshape(N, F)
    logits = flat @ wd_.astype(np.float64) + bd.astype(np.float64)
    p = np.exp(logits - logits.max(1, keepdims=True))
    p /= p.sum(1, keepdims=True)
    want_loss = -np.mean(np.log((p * labels).sum(1)))
    np.testing.assert_allclose(float(loss_t.data), want_loss,
                               rtol=1e-5, atol=1e-6)

    dlogits = (p - labels) / N
    dwd = flat.T @ dlogits
    dbd = dlogits.sum(0, keepdims=True)
    dflat = dlogits @ wd_.astype(np.float64).T
    dpool = dflat.reshape(pooled.shape)
    # all-ties-get-full-grad pooling VJP (framework/reference semantics)
    da1 = np.zeros_like(a1)
    for i in range(2):
        for j in range(2):
            da1[:, i::2, j::2, :] += dpool * (a1[:, i::2, j::2, :] == pooled)
    dz1 = da1 * (z1 >= 0.0)
    dbk = dz1.sum(axis=(0, 1, 2))
    # dW via patch correlation
    ph = K // 2
    xp = np.pad(x64, ((0, 0), (ph, ph), (ph, ph), (0, 0)))
    dwk = np.zeros((K, K, CI, CO))
    for i in range(K):
        for j in range(K):
            dwk[i, j] = np.einsum("nhwc,nhwf->cf",
                                  xp[:, i:i + H, j:j + W, :], dz1)

    np.testing.assert_allclose(np.asarray(dense.params["w"].grad), dwd,
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dense.params["b"].grad), dbd,
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(conv.params["b"].grad).ravel(),
                               dbk, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(conv.params["w"].grad), dwk,
                               rtol=1e-4, atol=1e-5)
