"""Serving precision (generate/generate_beam dtype=) and its interaction
with training-side mixed precision (compute_dtype=).

Contract under test (models/generate.py):
- dtype=bf16 runs the decode matmuls and holds the KV caches in bf16
  (norm/softmax/sampling cores stay f32); logits drift only at bf16
  resolution vs the f32 decode;
- the default (dtype=None) decodes in full f32 from the f32 MASTER
  params even when the net was trained with compute_dtype= — training
  precision and serving precision are independent knobs, so a
  bf16-trained net and its f32 twin generate identically.
"""

import numpy as np

import jax.numpy as jnp

from tinynn_autograd_tpu.models import build_tiny_llama, build_tiny_lm
from tinynn_autograd_tpu.models.generate import (
    _extract_any, _run_prefill, generate, generate_beam,
)
from tinynn_autograd_tpu.utils.seeder import random_seed

BF16 = jnp.bfloat16


def _llama(seed=0, vocab=17, dim=32, heads=4, kv_heads=2, depth=2,
           compute_dtype=None):
    random_seed(seed)
    net = build_tiny_llama(vocab=vocab, dim=dim, heads=heads,
                           kv_heads=kv_heads, depth=depth,
                           compute_dtype=compute_dtype)
    net.init((2, 8))
    return net, vocab


def test_bf16_serving_smoke_llama():
    net, vocab = _llama()
    prompt = np.random.RandomState(0).randint(0, vocab, (2, 4))
    out = np.asarray(generate(net, prompt, 6, dtype=BF16))
    assert out.shape == (2, 10)
    assert (out[:, :4] == prompt).all()
    assert ((out >= 0) & (out < vocab)).all()
    # second call reuses the dtype-keyed compiled program (no crash and
    # deterministic greedy output)
    out2 = np.asarray(generate(net, prompt, 6, dtype=BF16))
    np.testing.assert_array_equal(out, out2)


def test_bf16_serving_smoke_classic():
    random_seed(1)
    net = build_tiny_lm(vocab=13, seq_len=12, dim=16, heads=4, depth=1)
    net.init((2, 12))
    prompt = np.random.RandomState(1).randint(0, 13, (2, 3))
    out = np.asarray(generate(net, prompt, 5, dtype=BF16))
    assert out.shape == (2, 8)
    assert ((out >= 0) & (out < 13)).all()


def test_bf16_caches_and_logits_vs_f32():
    net, vocab = _llama(seed=2)
    prompt = jnp.asarray(
        np.random.RandomState(2).randint(0, vocab, (2, 6)), jnp.int32)

    cfg32, p32 = _extract_any(net, 2, 6, 4)
    cfg16, p16 = _extract_any(net, 2, 6, 4, BF16)
    logits32, caches32 = _run_prefill(cfg32, p32, prompt)
    logits16, caches16 = _run_prefill(cfg16, p16, prompt)

    # the caches live in the serving dtype (the KV-HBM halving)
    for ck, cv in caches16:
        assert ck.dtype == jnp.bfloat16 and cv.dtype == jnp.bfloat16
    for ck, cv in caches32:
        assert ck.dtype == jnp.float32 and cv.dtype == jnp.float32

    # logits come back f32 either way, bf16 within its resolution of f32
    assert logits16.dtype == jnp.float32
    scale = float(jnp.max(jnp.abs(logits32)))
    np.testing.assert_allclose(np.asarray(logits16) / scale,
                               np.asarray(logits32) / scale,
                               rtol=0.06, atol=0.06)


def test_mixed_precision_net_decodes_from_f32_masters():
    lo, vocab = _llama(seed=3, compute_dtype=BF16)
    hi, _ = _llama(seed=3)
    # identical f32 masters -> identical default-precision decode
    for ll, lh in zip(lo.layers, hi.layers):
        for k in ll.params:
            np.testing.assert_array_equal(np.asarray(ll.params[k].data),
                                          np.asarray(lh.params[k].data))
    prompt = np.random.RandomState(3).randint(0, vocab, (2, 4))
    np.testing.assert_array_equal(np.asarray(generate(lo, prompt, 6)),
                                  np.asarray(generate(hi, prompt, 6)))


def test_bf16_beam_smoke():
    net, vocab = _llama(seed=4)
    prompt = np.random.RandomState(4).randint(0, vocab, (2, 4))
    out = np.asarray(generate_beam(net, prompt, 5, beam_width=3,
                                   dtype=BF16))
    assert out.shape == (2, 9)
    assert ((out >= 0) & (out < vocab)).all()
