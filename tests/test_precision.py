"""bf16 matmul-precision mode: values stay close to f32, flag restores."""

import numpy as np

from tinynn_autograd_tpu import Tensor
from tinynn_autograd_tpu.ops import kernels


def test_bf16_matmul_mode_close_to_f32():
    rng = np.random.RandomState(0)
    a = rng.randn(64, 32).astype(np.float32)
    b = rng.randn(32, 16).astype(np.float32)
    exact = a @ b
    assert kernels.matmul_precision() == "f32"
    try:
        kernels.set_matmul_precision("bf16")
        ta = Tensor(a, requires_grad=True)
        out = ta @ Tensor(b)
        np.testing.assert_allclose(out.numpy(), exact, rtol=3e-2, atol=1e-1)
        out.backward(np.ones_like(exact))
        np.testing.assert_allclose(
            np.asarray(ta.grad), np.ones_like(exact) @ b.T,
            rtol=3e-2, atol=1e-1)
    finally:
        kernels.set_matmul_precision("f32")


def test_invalid_precision_rejected():
    import pytest

    with pytest.raises(ValueError):
        kernels.set_matmul_precision("fp8")
