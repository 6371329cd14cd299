"""Data-parallel tests on a simulated 8-device CPU mesh (conftest forces
--xla_force_host_platform_device_count=8): the psum/shard_map path must
compile, run, converge, and match single-device training numerically."""

import numpy as np
import pytest

import jax

from tinynn_autograd_tpu import Tensor
from tinynn_autograd_tpu.nn.layers import Dense, ReLU
from tinynn_autograd_tpu.nn.losses import SoftmaxCrossEntropyLoss
from tinynn_autograd_tpu.nn.model import Model
from tinynn_autograd_tpu.nn.net import Net
from tinynn_autograd_tpu.nn.optimizer import Adam, SGD
from tinynn_autograd_tpu.parallel import DataParallel, make_mesh
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


def test_eight_cpu_devices_available():
    assert len(jax.devices()) == 8


def test_dp_step_runs_and_converges():
    x, y = _data(64)
    model = _toy(1, Adam(lr=1e-2))
    dp = DataParallel(model, mesh=make_mesh(8))
    losses = [float(dp.train_step(x, y)) for _ in range(60)]
    assert losses[-1] < losses[0] * 0.7


def test_dp_matches_single_device():
    # gradient psum of per-shard mean-losses == full-batch gradient, so DP
    # training must track single-device training to float tolerance
    x, y = _data(64)
    m_dp = _toy(3, SGD(lr=0.1))
    m_single = _toy(3, SGD(lr=0.1))

    dp = DataParallel(m_dp, mesh=make_mesh(8))
    for _ in range(5):
        dp.train_step(x, y)
        m_single.train_step(x, y)

    for layer_dp, layer_s in zip(dp._params, m_single._params):
        for k in layer_dp:
            np.testing.assert_allclose(
                np.asarray(layer_dp[k]), np.asarray(layer_s[k]),
                rtol=2e-4, atol=1e-5)


def test_dp_batch_divisibility_check():
    x, y = _data(63)
    dp = DataParallel(_toy(4, SGD(lr=0.1)), mesh=make_mesh(8))
    with pytest.raises(ValueError):
        dp.train_step(x, y)


def test_dp_smaller_mesh():
    x, y = _data(32)
    dp = DataParallel(_toy(5, Adam(lr=1e-2)), mesh=make_mesh(4))
    loss = float(dp.train_step(x, y))
    assert np.isfinite(loss)


def test_dp_epoch_runs_and_converges():
    x, y = _data(128)
    dp = DataParallel(_toy(7, Adam(lr=1e-2)), mesh=make_mesh(8))
    first = None
    for _ in range(60):
        losses = np.asarray(dp.train_epoch(x, y, batch_size=32))
        assert losses.shape == (4,)
        mean = float(losses.mean())
        first = mean if first is None else first
    assert np.isfinite(mean) and mean < first * 0.6


def test_dp_epoch_matches_step_loop():
    # one dp epoch (no shuffle) == the per-step dp loop over the same batches
    x, y = _data(64)
    m_epoch = _toy(8, SGD(lr=0.1))
    m_step = _toy(8, SGD(lr=0.1))
    dpe = DataParallel(m_epoch, mesh=make_mesh(8))
    dps = DataParallel(m_step, mesh=make_mesh(8))

    losses = np.asarray(dpe.train_epoch(x, y, batch_size=16, shuffle=False))
    # NB: the epoch path shards the DATASET then batches locally; replicate
    # that batch composition for the step loop: device d's local rows are
    # x[d*8:(d+1)*8]; step i uses local rows [i*2:(i+1)*2] on each device
    per_dev = np.split(x, 8)
    per_dev_y = np.split(y, 8)
    step_losses = []
    for i in range(4):
        xb = np.concatenate([d[i * 2:(i + 1) * 2] for d in per_dev])
        yb = np.concatenate([d[i * 2:(i + 1) * 2] for d in per_dev_y])
        step_losses.append(float(dps.train_step(xb, yb)))
    np.testing.assert_allclose(losses, step_losses, rtol=2e-4, atol=1e-5)


def test_dp_loss_is_global_mean():
    x, y = _data(64)
    m_dp = _toy(6, SGD(lr=0.0))  # lr=0: params frozen
    m_ref = _toy(6, SGD(lr=0.0))
    dp = DataParallel(m_dp, mesh=make_mesh(8))
    dp_loss = float(dp.train_step(x, y))
    ref_loss = float(m_ref.train_step(x, y))
    np.testing.assert_allclose(dp_loss, ref_loss, rtol=1e-5)
