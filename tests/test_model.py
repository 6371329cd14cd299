"""Model-level tests: eager reference-style loop, the fused jitted train
step, eager-vs-fused parity, checkpointing, and evaluators."""

import os

import numpy as np
import pytest

from tinynn_autograd_tpu import Tensor
from tinynn_autograd_tpu.nn.evaluator import (
    AccEvaluator, EVEvaluator, F1Evaluator, MAEEvaluator, MSEEvaluator,
    PrecisionEvaluator, R2Evaluator, RecallEvaluator, ROCEvaluator,
)
from tinynn_autograd_tpu.nn.layers import Dense, ReLU
from tinynn_autograd_tpu.nn.losses import MSELoss, SoftmaxCrossEntropyLoss
from tinynn_autograd_tpu.nn.model import Model
from tinynn_autograd_tpu.nn.net import Net
from tinynn_autograd_tpu.nn.optimizer import Adam, SGD
from tinynn_autograd_tpu.utils.seeder import random_seed


def setup_module():
    random_seed(42)


def _toy_data(n=64, din=8, classes=4, seed=0):
    rng = np.random.RandomState(seed)
    x = rng.randn(n, din).astype(np.float32)
    y_idx = rng.randint(0, classes, n)
    y = np.eye(classes, dtype=np.float32)[y_idx]
    return x, y, y_idx


def _toy_model(din=8, classes=4, opt=None):
    net = Net([Dense(16, num_in=din), ReLU(), Dense(classes, num_in=16)])
    return Model(net, SoftmaxCrossEntropyLoss(), opt or Adam(lr=1e-2))


def test_eager_reference_loop_converges():
    x, y, _ = _toy_data()
    model = _toy_model()
    first = last = None
    for i in range(30):
        model.zero_grad()
        pred = model.forward(Tensor(x))
        loss = model.loss.loss(pred, Tensor(y))
        loss.backward()
        model.step()
        v = float(loss.values)
        first = v if first is None else first
        last = v
    assert last < first * 0.7


def test_fused_train_step_converges():
    x, y, _ = _toy_data()
    model = _toy_model()
    losses = [float(model.train_step(x, y)) for _ in range(40)]
    assert losses[-1] < losses[0] * 0.5


def test_fused_matches_eager_sgd():
    # same init, same data: one fused step must equal one eager step
    x, y, _ = _toy_data(n=16)
    random_seed(5)
    m1 = _toy_model(opt=SGD(lr=0.1))
    random_seed(5)
    m2 = _toy_model(opt=SGD(lr=0.1))

    m1.train_step(x, y)
    w_fused = np.asarray(m1._params[0]["w"])

    m2.zero_grad()
    loss = m2.loss.loss(m2.forward(Tensor(x)), Tensor(y))
    loss.backward()
    m2.step()
    w_eager = m2.net.layers[0].params["w"].numpy()

    np.testing.assert_allclose(w_fused, w_eager, rtol=1e-5, atol=1e-6)


def test_fused_matches_eager_adam_multi_step():
    x, y, _ = _toy_data(n=16)
    random_seed(9)
    m1 = _toy_model(opt=Adam(lr=1e-2))
    random_seed(9)
    m2 = _toy_model(opt=Adam(lr=1e-2))

    for _ in range(3):
        m1.train_step(x, y)
    for _ in range(3):
        m2.zero_grad()
        loss = m2.loss.loss(m2.forward(Tensor(x)), Tensor(y))
        loss.backward()
        m2.step()

    np.testing.assert_allclose(
        np.asarray(m1._params[2]["w"]),
        m2.net.layers[2].params["w"].numpy(),
        rtol=1e-4, atol=1e-6)


def test_grad_parity_fused_vs_eager():
    # the driver metric: grads inside the fused program match the eagerly
    # computed tape grads <= 1e-5
    x, y, _ = _toy_data(n=16)
    random_seed(11)
    model = _toy_model(opt=SGD(lr=1.0))  # step = -grad: read grads off delta
    w_before = model.net.layers[0].params["w"].numpy().copy()
    model.train_step(x, y)
    w_after = np.asarray(model._params[0]["w"])
    fused_grad = -(w_after - w_before)  # lr=1, step=-g

    random_seed(11)
    m2 = _toy_model(opt=SGD(lr=1.0))
    m2.zero_grad()
    loss = m2.loss.loss(m2.forward(Tensor(x)), Tensor(y))
    loss.backward()
    eager_grad = np.asarray(m2.net.layers[0].params["w"].grad)

    np.testing.assert_allclose(fused_grad, eager_grad, rtol=1e-5, atol=1e-6)


def test_fused_then_eager_then_fused_state_coherent():
    # fused -> eager -> fused: the second fused call must adopt the state
    # the eager step just advanced, not a stale cached copy
    x, y, _ = _toy_data(n=16)
    model = _toy_model(opt=Adam(lr=1e-2))
    model.train_step(x, y)                      # t=1
    model.zero_grad()
    loss = model.loss.loss(model.forward(Tensor(x)), Tensor(y))
    loss.backward()
    model.step()                                # t=2 (facade)
    model.train_step(x, y)                      # must continue at t=3
    assert int(model._opt_state["t"]) == 3


def test_eager_then_fused_keeps_optimizer_state():
    # interleaving the reference-style eager loop with the fused step must
    # not silently reset the optimizer moments / step counter
    x, y, _ = _toy_data(n=16)
    model = _toy_model(opt=Adam(lr=1e-2))
    for _ in range(3):
        model.zero_grad()
        loss = model.loss.loss(model.forward(Tensor(x)), Tensor(y))
        loss.backward()
        model.step()
    assert int(model.optimizer.state_dict()["t"]) == 3
    model.train_step(x, y)
    assert int(model._opt_state["t"]) == 4
    # and fused state flows back to the eager facade
    assert int(model.optimizer.state_dict()["t"]) == 4


def test_predict_and_phase():
    x, y, _ = _toy_data(n=8)
    model = _toy_model()
    model.set_phase("TEST")
    out = model.predict(x)
    assert out.shape == (8, 4)
    assert model.get_phase() == "TEST"
    model.set_phase("TRAIN")


def test_fit_high_level_loop():
    x, y, y_idx = _toy_data(n=64)
    model = _toy_model()
    hist = model.fit(x, y, epochs=5, batch_size=16,
                     eval_data=(x, y_idx), evaluator=AccEvaluator,
                     eval_every=5, verbose=False)
    assert len(hist["loss"]) == 5
    assert hist["loss"][-1] < hist["loss"][0]
    assert len(hist["eval"]) == 1
    assert 0.0 <= hist["eval"][0]["accuracy"] <= 1.0


def test_save_load_roundtrip(tmp_path):
    x, y, _ = _toy_data(n=8)
    model = _toy_model()
    model.train_step(x, y)
    path = os.path.join(tmp_path, "ckpt.pkl")
    model.save(path)

    model2 = _toy_model()
    model2.load(path)
    np.testing.assert_allclose(
        model2.net.layers[0].params["w"].numpy(),
        np.asarray(model._params[0]["w"]), rtol=1e-6)
    # predictions identical
    np.testing.assert_allclose(
        model2.predict(x).numpy(),
        model.predict(x).numpy(), rtol=1e-5, atol=1e-6)


def _eager_step(model, x, y):
    model.zero_grad()
    loss = model.loss.loss(model.forward(Tensor(x)), Tensor(y))
    loss.backward()
    model.step()


def test_eager_save_resume_bit_identical(tmp_path):
    # VERDICT r2 bug: step() nulls _opt_state and save() used to checkpoint
    # opt_state=None after eager training, silently restarting Adam moments
    # on resume. Save must fall back to the optimizer facade state; a
    # save/load-resumed run must match an uninterrupted run bit-for-bit.
    x, y, _ = _toy_data(n=16)
    random_seed(21)
    m1 = _toy_model(opt=Adam(lr=1e-2))
    for _ in range(3):
        _eager_step(m1, x, y)
    assert int(m1.optimizer.state_dict()["t"]) == 3
    path = os.path.join(tmp_path, "ckpt.pkl")
    m1.save(path)

    m2 = _toy_model(opt=Adam(lr=1e-2))
    m2.load(path)
    assert int(m2.optimizer.state_dict()["t"]) == 3  # moments survived

    random_seed(21)
    m3 = _toy_model(opt=Adam(lr=1e-2))  # uninterrupted twin
    for _ in range(4):
        _eager_step(m3, x, y)
    _eager_step(m2, x, y)  # resumed 4th step

    for li in (0, 2):
        np.testing.assert_array_equal(
            m2.net.layers[li].params["w"].numpy(),
            m3.net.layers[li].params["w"].numpy())


def test_save_before_init_raises(tmp_path):
    model = Model(Net([Dense(16), ReLU(), Dense(4)]),
                  SoftmaxCrossEntropyLoss(), Adam())
    with pytest.raises(RuntimeError, match="never initialized"):
        model.save(os.path.join(tmp_path, "ckpt.pkl"))


def test_weights_only_load_clears_stale_opt_state(tmp_path):
    # loading a weights-only checkpoint into a trained model must not keep
    # the old run's moments against the new params
    x, y, _ = _toy_data(n=8)
    fresh = _toy_model()
    fresh._ensure_init(x.shape)
    path = os.path.join(tmp_path, "weights.pkl")
    fresh.save(path)  # never trained: opt_state is None

    trained = _toy_model()
    for _ in range(2):
        trained.train_step(x, y)
    assert trained._opt_state is not None
    trained.load(path)
    assert trained._opt_state is None
    assert trained.optimizer.state_dict() is None


def test_load_shape_mismatch_raises(tmp_path):
    x, y, _ = _toy_data(n=8)
    model = _toy_model()
    model.train_step(x, y)
    path = os.path.join(tmp_path, "ckpt.pkl")
    model.save(path)

    other = Model(Net([Dense(16, num_in=5), ReLU(), Dense(4, num_in=16)]),
                  SoftmaxCrossEntropyLoss(), Adam())
    with pytest.raises(ValueError):
        other.load(path)


def test_export_stablehlo_roundtrip(tmp_path):
    from jax import export as jax_export

    x, y, _ = _toy_data(n=4)
    model = _toy_model()
    model.train_step(x, y)
    path = os.path.join(tmp_path, "model.shlo")
    model.export_stablehlo(path, x)
    with open(path, "rb") as f:
        exported = jax_export.deserialize(bytearray(f.read()))
    np.testing.assert_allclose(
        np.asarray(exported.call(x)), model.predict(x).numpy(),
        rtol=1e-5, atol=1e-6)


def test_net_set_parameters_checked():
    net = Net([Dense(4, num_in=3)])
    good = [{"w": np.zeros((3, 4), np.float32), "b": np.zeros((1, 4), np.float32)}]
    net.set_parameters(good)
    with pytest.raises(AssertionError):
        net.set_parameters([{"w": np.zeros((2, 4), np.float32),
                             "b": np.zeros((1, 4), np.float32)}])


def test_deep_graph_stress():
    # driver config #3: deep MLP, long tape, single fused program
    from tinynn_autograd_tpu.models.mlp import build_deep_mlp

    net = build_deep_mlp(num_in=16, depth=50, width=16, num_out=4)
    model = Model(net, MSELoss(), SGD(lr=1e-3))
    rng = np.random.RandomState(0)
    x = rng.randn(4, 16).astype(np.float32)
    y = rng.randn(4, 4).astype(np.float32)
    l0 = float(model.train_step(x, y))
    for _ in range(5):
        l1 = float(model.train_step(x, y))
    assert np.isfinite(l0) and np.isfinite(l1)


def test_evaluators():
    preds = np.array([0, 1, 1, 2])
    targets = np.array([0, 1, 0, 2])
    acc = AccEvaluator.evaluate(preds, targets)
    assert acc["accuracy"] == 0.75
    assert acc["hit_num"] == 3

    p = PrecisionEvaluator.evaluate(preds, targets)
    r = RecallEvaluator.evaluate(preds, targets)
    f = F1Evaluator.evaluate(preds, targets)
    # class 0: tp=1 fp=0 fn=1; class 1: tp=1 fp=1 fn=0; class 2: tp=1
    np.testing.assert_allclose(p["precision"], np.mean([1.0, 0.5, 1.0]))
    np.testing.assert_allclose(r["recall"], np.mean([0.5, 1.0, 1.0]))
    assert 0 < f["f1"] <= 1

    scores = np.array([0.9, 0.8, 0.3, 0.2])
    labels = np.array([1, 1, 0, 0])
    assert ROCEvaluator.evaluate(scores, labels)["auc"] == 1.0
    labels2 = np.array([1, 0, 1, 0])
    # concordant pairs: (.9,.8) (.9,.2) (.3,.2); discordant: (.3,.8) -> 3/4
    assert ROCEvaluator.evaluate(scores, labels2)["auc"] == 0.75

    a = np.array([1.0, 2.0, 3.0])
    b = np.array([1.1, 1.9, 3.2])
    assert MSEEvaluator.evaluate(a, b)["mse"] > 0
    assert MAEEvaluator.evaluate(a, b)["mae"] > 0
    assert EVEvaluator.evaluate(a, b)["mean_ev"] < 1.0
    assert R2Evaluator.evaluate(b, a)["r2"] < 1.0
    assert R2Evaluator.evaluate(a, a)["r2"] == 1.0
