"""Sanitizer utilities: NaN guards and jit-vs-eager parity checker."""

import numpy as np
import pytest

from tinynn_autograd_tpu import Tensor
from tinynn_autograd_tpu.nn.layers import Dense, ReLU
from tinynn_autograd_tpu.nn.losses import SoftmaxCrossEntropyLoss
from tinynn_autograd_tpu.nn.model import Model
from tinynn_autograd_tpu.nn.net import Net
from tinynn_autograd_tpu.nn.optimizer import Adam
from tinynn_autograd_tpu.utils import debug
from tinynn_autograd_tpu.utils.seeder import random_seed


def test_assert_finite_passes_and_raises():
    debug.assert_finite([{"w": np.ones((2, 2))}])
    with pytest.raises(FloatingPointError) as e:
        debug.assert_finite([{"w": np.array([1.0, np.nan])}], name="params")
    assert "params" in str(e.value)
    debug.assert_finite({"t": Tensor([1.0, 2.0])})
    with pytest.raises(FloatingPointError):
        debug.assert_finite(np.array([np.inf]))


def test_check_jit_parity_clean_model():
    random_seed(0)
    net = Net([Dense(16, num_in=8), ReLU(), Dense(4, num_in=16)])
    model = Model(net, SoftmaxCrossEntropyLoss(), Adam(lr=1e-2))
    rng = np.random.RandomState(0)
    x = rng.randn(16, 8).astype(np.float32)
    y = np.eye(4, dtype=np.float32)[rng.randint(0, 4, 16)]
    dev = debug.check_jit_parity(model, x, y)
    assert dev <= 1e-5
    # model state untouched: training still works afterwards
    loss = float(model.train_step(x, y))
    assert np.isfinite(loss)
