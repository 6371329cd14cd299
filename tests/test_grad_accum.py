"""Gradient accumulation (Model.train_step(accum_steps=)) tests: exact
parity with the full-batch step for mean-reduction losses, stateful
optimizers across the accumulated update, error handling, and composition
with Remat. No reference counterpart (the reference trains strictly one
batch per update, reference examples/mnist/run.py:76-84)."""

import numpy as np
import pytest

from tinynn_autograd_tpu.nn.layers import Dense, ReLU, Remat
from tinynn_autograd_tpu.nn.losses import SoftmaxCrossEntropyLoss
from tinynn_autograd_tpu.nn.model import Model
from tinynn_autograd_tpu.nn.net import Net
from tinynn_autograd_tpu.nn.optimizer import Adam, SGD
from tinynn_autograd_tpu.utils.seeder import random_seed


def setup_module():
    random_seed(23)


def _model(opt, wrap=False):
    layers = []
    for i, (nin, nout) in enumerate([(10, 24), (24, 24), (24, 5)]):
        d = Dense(nout, num_in=nin, seed=300 + i)
        layers += [Remat(d) if wrap else d]
        if nout != 5:
            layers.append(ReLU())
    return Model(Net(layers), SoftmaxCrossEntropyLoss(), opt)


def _data(n=32):
    x = np.random.randn(n, 10).astype(np.float32)
    y = np.eye(5, dtype=np.float32)[np.random.randint(0, 5, n)]
    return x, y


def test_accum_matches_full_batch_sgd():
    x, y = _data()
    m_full, m_acc = _model(SGD(0.1)), _model(SGD(0.1))
    l_full = float(m_full.train_step(x, y))
    l_acc = float(m_acc.train_step(x, y, accum_steps=4))
    # mean-reduction CE over equal microbatches: same loss, same update
    np.testing.assert_allclose(l_acc, l_full, rtol=1e-6)
    for pf, pa in zip(m_full.net.params_tree(), m_acc.net.params_tree()):
        for k in pf:
            np.testing.assert_allclose(np.asarray(pa[k]), np.asarray(pf[k]),
                                       rtol=1e-5, atol=1e-7)


def test_accum_matches_full_batch_adam_multistep():
    x, y = _data()
    m_full, m_acc = _model(Adam(1e-2)), _model(Adam(1e-2))
    for _ in range(4):
        l_full = float(m_full.train_step(x, y))
        l_acc = float(m_acc.train_step(x, y, accum_steps=8))
    np.testing.assert_allclose(l_acc, l_full, rtol=1e-4)
    for pf, pa in zip(m_full.net.params_tree(), m_acc.net.params_tree()):
        for k in pf:
            np.testing.assert_allclose(np.asarray(pa[k]), np.asarray(pf[k]),
                                       rtol=1e-4, atol=1e-6)


def test_accum_indivisible_batch_raises():
    x, y = _data(30)
    m = _model(SGD(0.1))
    with pytest.raises(ValueError, match="not divisible"):
        m.train_step(x, y, accum_steps=4)


def test_accum_composes_with_remat():
    """The HBM-constrained recipe: microbatching AND per-block activation
    checkpointing in the same jitted step."""
    x, y = _data()
    m_plain, m_both = _model(SGD(0.1)), _model(SGD(0.1), wrap=True)
    l_plain = float(m_plain.train_step(x, y))
    l_both = float(m_both.train_step(x, y, accum_steps=4))
    np.testing.assert_allclose(l_both, l_plain, rtol=1e-6)
    for pf, pa in zip(m_plain.net.params_tree(), m_both.net.params_tree()):
        for k in pf:
            np.testing.assert_allclose(np.asarray(pa[k]), np.asarray(pf[k]),
                                       rtol=1e-5, atol=1e-7)


def test_accum_step_counter_advances_once():
    x, y = _data()
    m = _model(Adam(1e-3))
    m.train_step(x, y, accum_steps=4)
    m.train_step(x, y, accum_steps=4)
    assert int(m._opt_state["t"]) == 2
