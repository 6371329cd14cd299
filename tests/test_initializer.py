"""Statistical initializer tests mirroring the reference's strategy
(reference: test/test_core_initializer.py — 100k-sample moment and bound
checks), against the jax-PRNG-backed initializer zoo."""

import numpy as np

from tinynn_autograd_tpu.nn.initializer import (
    ConstantInit, HeNormalInit, HeUniformInit, NormalInit, OnesInit,
    TruncatedNormalInit, UniformInit, XavierNormalInit, XavierUniformInit,
    ZerosInit, get_fans,
)
from tinynn_autograd_tpu.utils.seeder import random_seed

SHAPE = (500, 200)  # 100k samples


def setup_module():
    random_seed(31)


def test_get_fans():
    assert get_fans((100, 10)) == (100, 10)
    # conv kernel [out, in, kh, kw]
    assert get_fans((32, 16, 3, 3)) == (16 * 3 * 3, 32)


def test_normal():
    vals = NormalInit(mean=0.5, std=2.0)(SHAPE).numpy()
    assert abs(vals.mean() - 0.5) < 2e-2
    assert abs(vals.std() - 2.0) < 2e-2


def test_truncated_normal():
    vals = TruncatedNormalInit(mean=0.0, std=1.0)(SHAPE).numpy()
    assert vals.min() >= -2.0 - 1e-6
    assert vals.max() <= 2.0 + 1e-6
    assert abs(vals.mean()) < 1e-2

    # pin the documented divergence (nn/initializer.py docstring): bounds are
    # mean ± 2*std for ANY std. The reference double-scales for std != 1
    # (reference: core/initializer.py:37 passes ±2*std as *standardized*
    # bounds), which for std=0.5 would truncate at mean ± 2*std*std = ±0.25.
    # Assert our bounds hold AND that draws actually exceed the
    # double-scaled bounds, so this test fails under either semantics drift.
    vals2 = TruncatedNormalInit(mean=1.0, std=0.5)(SHAPE).numpy()
    assert vals2.min() >= 1.0 - 2 * 0.5 - 1e-6
    assert vals2.max() <= 1.0 + 2 * 0.5 + 1e-6
    assert vals2.max() > 1.0 + 2 * 0.5 * 0.5  # would fail if double-scaled
    assert vals2.min() < 1.0 - 2 * 0.5 * 0.5


def test_uniform():
    vals = UniformInit(-3.0, 5.0)(SHAPE).numpy()
    assert vals.min() >= -3.0
    assert vals.max() < 5.0
    assert abs(vals.mean() - 1.0) < 5e-2


def test_constant_zeros_ones():
    assert (ConstantInit(7.0)((3, 4)).numpy() == 7.0).all()
    assert (ZerosInit()((3, 4)).numpy() == 0.0).all()
    assert (OnesInit()((3, 4)).numpy() == 1.0).all()


def test_xavier_uniform():
    fan_in, fan_out = SHAPE
    bound = np.sqrt(6.0 / (fan_in + fan_out))
    vals = XavierUniformInit()(SHAPE).numpy()
    assert vals.min() >= -bound
    assert vals.max() <= bound
    assert abs(vals.mean()) < 1e-2


def test_xavier_normal():
    fan_in, fan_out = SHAPE
    std = np.sqrt(2.0 / (fan_in + fan_out))
    vals = XavierNormalInit()(SHAPE).numpy()
    assert abs(vals.mean()) < 1e-2
    assert abs(vals.std() - std) < 1e-2


def test_he_uniform():
    fan_in, _ = SHAPE
    bound = np.sqrt(6.0 / fan_in)
    vals = HeUniformInit()(SHAPE).numpy()
    assert vals.min() >= -bound
    assert vals.max() <= bound


def test_he_normal():
    fan_in, _ = SHAPE
    std = np.sqrt(2.0 / fan_in)
    vals = HeNormalInit()(SHAPE).numpy()
    assert abs(vals.mean()) < 1e-2
    assert abs(vals.std() - std) < 1e-2


def test_initializer_output_is_trainable_f32():
    t = XavierUniformInit()((4, 4))
    assert t.requires_grad
    assert str(t.dtype) == "float32"
    assert t.grad is not None  # auto-zeroed


def test_seeded_reproducibility():
    random_seed(123)
    a = NormalInit()((8, 8)).numpy()
    random_seed(123)
    b = NormalInit()((8, 8)).numpy()
    np.testing.assert_array_equal(a, b)
