"""Pallas kernel correctness on CPU via interpret mode: the tiled MXU
matmul must match XLA's dot bit-for-bit-ish (fp32 accumulation) across
aligned, ragged, and tiny shapes, including the padding paths."""

import numpy as np
import pytest

import jax.numpy as jnp

from tinynn_autograd_tpu.ops.kernels import pallas_matmul


@pytest.mark.parametrize("m,k,n", [
    (128, 128, 128),     # exactly one tile
    (256, 512, 256),     # multi-tile, aligned
    (128, 784, 200),     # MNIST layer 1: ragged k and n
    (100, 30, 10),       # smaller than one tile everywhere
    (1, 784, 200),       # single row
    (130, 129, 131),     # off-by-a-few on every dim
])
def test_pallas_matmul_matches_xla(m, k, n):
    rng = np.random.RandomState(0)
    a = rng.randn(m, k).astype(np.float32)
    b = rng.randn(k, n).astype(np.float32)
    expected = np.asarray(jnp.matmul(a, b))
    got = np.asarray(pallas_matmul(jnp.asarray(a), jnp.asarray(b),
                                   interpret=True))
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-4)


def test_pallas_matmul_bf16_inputs_fp32_accum():
    rng = np.random.RandomState(1)
    a = rng.randn(128, 256).astype(np.float32)
    b = rng.randn(256, 128).astype(np.float32)
    got = np.asarray(pallas_matmul(
        jnp.asarray(a, jnp.bfloat16), jnp.asarray(b, jnp.bfloat16),
        interpret=True)).astype(np.float32)
    expected = a.astype(np.float32) @ b.astype(np.float32)
    # bf16 inputs: ~3 decimal digits; accumulation is fp32 so error stays
    # at input-rounding scale
    np.testing.assert_allclose(got, expected, rtol=2e-2, atol=2e-1)


def test_dispatch_falls_back_off_tpu():
    # on CPU the dispatcher must route to XLA-native (no pallas interpret
    # in production paths)
    from tinynn_autograd_tpu.ops import kernels

    a = jnp.ones((256, 256), jnp.float32)
    out = kernels.matmul(a, a)
    np.testing.assert_allclose(np.asarray(out), np.full((256, 256), 256.0))


def test_block_kernel_interpret_matches_tape_forward():
    """Fused transformer-block forward kernel (probe, ops/block_kernel.py)
    == the tape block's forward, interpret mode."""
    import jax.numpy as jnp

    from tinynn_autograd_tpu.core.tensor import Tensor
    from tinynn_autograd_tpu.nn.layers import TransformerBlock
    from tinynn_autograd_tpu.ops import block_kernel

    for causal in (False, True):
        blk = TransformerBlock(dim=32, num_heads=4, causal=causal, seed=9)
        params = {k: v.data for k, v in blk.params.items()}
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(8, 16, 32).astype(np.float32) * 0.5)
        ref = np.asarray(blk.forward(Tensor(x)).data)
        got = np.asarray(block_kernel.block_fwd_pallas(
            x, params, heads=4, causal=causal, batch_block=2,
            interpret=True))
        np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-5)
