"""Flash-attention kernel + primitive tests (VERDICT r3 item 1).

The Pallas kernels run in interpret mode on CPU (same code path the TPU
compiles); the XLA fallback is the exact-math twin. Oracles: float64 naive
softmax attention, the existing tape composition (dot_/softmax_/dot_), and
central finite differences through the primitive.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from tinynn_autograd_tpu.core.tensor import Tensor
from tinynn_autograd_tpu.ops import attention
import tinynn_autograd_tpu.ops as ops
from tinynn_autograd_tpu.utils.seeder import random_seed


def _qkv(b=2, h=2, t=16, d=8, seed=0):
    rng = np.random.RandomState(seed)
    mk = lambda: rng.randn(b, h, t, d).astype(np.float32)
    return mk(), mk(), mk()


def _naive(q, k, v, causal, scale):
    q64, k64, v64 = (x.astype(np.float64) for x in (q, k, v))
    s = np.einsum("bhqd,bhkd->bhqk", q64, k64) * scale
    if causal:
        t = q.shape[2]
        mask = np.tril(np.ones((t, t), bool))
        s = np.where(mask, s, -1e30)
    p = np.exp(s - s.max(-1, keepdims=True))
    p = p / p.sum(-1, keepdims=True)
    return np.einsum("bhqk,bhkd->bhqd", p, v64)


@pytest.mark.parametrize("causal", [False, True])
def test_xla_forward_matches_naive(causal):
    q, k, v = _qkv()
    scale = 1.0 / np.sqrt(q.shape[-1])
    o, lse = attention.mha_fwd(jnp.asarray(q), jnp.asarray(k),
                               jnp.asarray(v), causal=causal, scale=scale,
                               impl="xla")
    np.testing.assert_allclose(np.asarray(o), _naive(q, k, v, causal, scale),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("t", [16, 256, 640])
def test_pallas_interpret_matches_xla(causal, t):
    """Interpret mode runs the EXACT kernel Mosaic compiles on TPU —
    t=256 exercises the multi-block online-softmax recurrence and the
    causal block-skip predicate; t=640 the round-5 whole-plane single
    kernel on a length where a gridded tiling exists (128-tiles) but the
    single-plane envelope check overrides it."""
    q, k, v = _qkv(b=1, h=4, t=t, d=8, seed=1)
    scale = 0.3
    args = (jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    o_x, lse_x = attention.mha_fwd(*args, causal=causal, scale=scale,
                                   impl="xla")
    o_p, lse_p = attention.mha_fwd(*args, causal=causal, scale=scale,
                                   impl="pallas_interpret")
    np.testing.assert_allclose(np.asarray(o_p), np.asarray(o_x),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(lse_p), np.asarray(lse_x),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("t", [16, 256, 640])
def test_pallas_interpret_backward_matches_xla(causal, t):
    q, k, v = _qkv(b=1, h=4, t=t, d=8, seed=2)
    rng = np.random.RandomState(3)
    do = rng.randn(*q.shape).astype(np.float32)
    scale = 1.0 / np.sqrt(q.shape[-1])
    args = (jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    o, lse = attention.mha_fwd(*args, causal=causal, scale=scale,
                               impl="xla")
    ref = attention.mha_bwd(*args, o, lse, jnp.asarray(do), causal=causal,
                            scale=scale, impl="xla")
    got = attention.mha_bwd(*args, o, lse, jnp.asarray(do), causal=causal,
                            scale=scale, impl="pallas_interpret")
    for g, r, name in zip(got, ref, "qkv"):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=1e-4, atol=1e-5,
                                   err_msg="d%s mismatch" % name)


@pytest.mark.parametrize("causal", [False, True])
def test_primitive_matches_tape_attention(causal):
    """flash_attention_ must agree with the explicit tape composition
    (batched dot_ + softmax_ + dot_) in value AND all three gradients."""
    q, k, v = _qkv(b=2, h=2, t=12, d=4, seed=4)
    rng = np.random.RandomState(5)
    do = rng.randn(*q.shape).astype(np.float32)
    scale = 1.0 / np.sqrt(q.shape[-1])

    qt, kt, vt = (Tensor(x, requires_grad=True) for x in (q, k, v))
    out_f = ops.flash_attention_(qt, kt, vt, causal=causal, scale=scale)
    out_f.backward(Tensor(do))

    q2, k2, v2 = (Tensor(x, requires_grad=True) for x in (q, k, v))
    scores = (q2 @ k2.transpose((0, 1, 3, 2))) * scale
    if causal:
        t = q.shape[2]
        mask = jnp.where(
            jnp.asarray(np.tril(np.ones((t, t), np.float32))) == 1.0,
            0.0, -1e9)
        scores = scores + mask
    out_t = ops.softmax_(scores, axis=-1) @ v2
    out_t.backward(Tensor(do))

    np.testing.assert_allclose(np.asarray(out_f.data),
                               np.asarray(out_t.data), rtol=1e-5, atol=1e-6)
    for a, b, name in [(qt, q2, "dq"), (kt, k2, "dk"), (vt, v2, "dv")]:
        np.testing.assert_allclose(np.asarray(a.grad), np.asarray(b.grad),
                                   rtol=1e-4, atol=1e-5, err_msg=name)


def test_primitive_finite_difference():
    q, k, v = _qkv(b=1, h=1, t=6, d=3, seed=6)
    eps = 1e-3

    def loss_of(qa, ka, va):
        o, _ = attention.mha_fwd(jnp.asarray(qa), jnp.asarray(ka),
                                 jnp.asarray(va), causal=True, impl="xla")
        return float(np.asarray(o).sum() + (np.asarray(o) ** 2).sum())

    qt, kt, vt = (Tensor(x, requires_grad=True) for x in (q, k, v))
    out = ops.flash_attention_(qt, kt, vt, causal=True)
    (ops.sum(out) + ops.sum(out * out)).backward()

    rng = np.random.RandomState(7)
    for arr, ts, name in [(q, qt, "q"), (k, kt, "k"), (v, vt, "v")]:
        for _ in range(5):
            idx = tuple(rng.randint(0, s) for s in arr.shape)
            ap, am = arr.copy(), arr.copy()
            ap[idx] += eps
            am[idx] -= eps
            args_p = [ap if n == name else a
                      for a, n in [(q, "q"), (k, "k"), (v, "v")]]
            args_m = [am if n == name else a
                      for a, n in [(q, "q"), (k, "k"), (v, "v")]]
            fd = (loss_of(*args_p) - loss_of(*args_m)) / (2 * eps)
            np.testing.assert_allclose(float(np.asarray(ts.grad)[idx]), fd,
                                       rtol=2e-2, atol=1e-3,
                                       err_msg="d%s[%s]" % (name, idx))


@pytest.mark.parametrize("causal", [False, True])
def test_transformer_block_fused_matches_tape(causal):
    """TransformerBlock(attn='fused') must be a drop-in for attn='tape':
    same forward, same parameter gradients."""
    from tinynn_autograd_tpu.nn.layers import TransformerBlock

    random_seed(8)
    blk_f = TransformerBlock(dim=16, num_heads=4, causal=causal,
                             attn="fused", seed=3)
    blk_t = TransformerBlock(dim=16, num_heads=4, causal=causal,
                             attn="tape", seed=3)
    rng = np.random.RandomState(9)
    x = rng.randn(2, 8, 16).astype(np.float32)
    do = rng.randn(2, 8, 16).astype(np.float32)

    xf = Tensor(x, requires_grad=True)
    of = blk_f.forward(xf)
    of.backward(Tensor(do))
    xt = Tensor(x, requires_grad=True)
    ot = blk_t.forward(xt)
    ot.backward(Tensor(do))

    np.testing.assert_allclose(np.asarray(of.data), np.asarray(ot.data),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(xf.grad), np.asarray(xt.grad),
                               rtol=1e-4, atol=1e-5)
    for kname in blk_f.params:
        np.testing.assert_allclose(
            np.asarray(blk_f.params[kname].grad),
            np.asarray(blk_t.params[kname].grad),
            rtol=1e-4, atol=1e-5, err_msg=kname)


def test_head_batch_is_divisor():
    for bh in (1, 2, 6, 8, 256):
        g = attention._pick_head_batch(bh, 128, 128, 64)
        assert bh % g == 0 and 1 <= g <= bh


def test_cross_attention_tq_ne_tk():
    """Cross-attention (decoder queries over encoder keys): Tq != Tk must
    match the f64 oracle in value and pass the tape gradient contract."""
    b, h, tq, tk, d = 2, 2, 8, 20, 4
    rng = np.random.RandomState(11)
    q = rng.randn(b, h, tq, d).astype(np.float32)
    k = rng.randn(b, h, tk, d).astype(np.float32)
    v = rng.randn(b, h, tk, d).astype(np.float32)
    do = rng.randn(b, h, tq, d).astype(np.float32)
    scale = 1.0 / np.sqrt(d)

    o, _ = attention.mha_fwd(jnp.asarray(q), jnp.asarray(k),
                             jnp.asarray(v), scale=scale, impl="xla")
    np.testing.assert_allclose(np.asarray(o),
                               _naive(q, k, v, False, scale),
                               rtol=1e-5, atol=1e-6)

    # grads vs the explicit tape composition
    qt, kt, vt = (Tensor(x, requires_grad=True) for x in (q, k, v))
    out = ops.flash_attention_(qt, kt, vt, scale=scale)
    out.backward(Tensor(do))
    q2, k2, v2 = (Tensor(x, requires_grad=True) for x in (q, k, v))
    out2 = ops.softmax_((q2 @ k2.transpose((0, 1, 3, 2))) * scale,
                        axis=-1) @ v2
    out2.backward(Tensor(do))
    assert qt.grad.shape == (b, h, tq, d)
    assert kt.grad.shape == (b, h, tk, d)
    for a, bb, name in [(qt, q2, "dq"), (kt, k2, "dk"), (vt, v2, "dv")]:
        np.testing.assert_allclose(np.asarray(a.grad), np.asarray(bb.grad),
                                   rtol=1e-4, atol=1e-5, err_msg=name)


def test_cross_attention_pallas_interpret():
    """The kernels themselves handle Tq != Tk (separate bq/bk grids)."""
    b, h, tq, tk, d = 1, 2, 128, 256, 8
    rng = np.random.RandomState(12)
    q = jnp.asarray(rng.randn(b, h, tq, d).astype(np.float32))
    k = jnp.asarray(rng.randn(b, h, tk, d).astype(np.float32))
    v = jnp.asarray(rng.randn(b, h, tk, d).astype(np.float32))
    do = jnp.asarray(rng.randn(b, h, tq, d).astype(np.float32))
    o_x, lse_x = attention.mha_fwd(q, k, v, impl="xla")
    o_p, lse_p = attention.mha_fwd(q, k, v, impl="pallas_interpret")
    np.testing.assert_allclose(np.asarray(o_p), np.asarray(o_x),
                               rtol=1e-5, atol=1e-6)
    ref = attention.mha_bwd(q, k, v, o_x, lse_x, do, impl="xla")
    got = attention.mha_bwd(q, k, v, o_x, lse_x, do,
                            impl="pallas_interpret")
    for gg, r in zip(got, ref):
        np.testing.assert_allclose(np.asarray(gg), np.asarray(r),
                                   rtol=1e-4, atol=1e-5)


def test_causal_cross_attention_rejected():
    q = jnp.zeros((1, 1, 8, 4))
    k = jnp.zeros((1, 1, 16, 4))
    with pytest.raises(ValueError, match="Tq == Tk"):
        attention.mha_fwd(q, k, k, causal=True)


# ------------------------------------------- attention-probability dropout

@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("t", [16, 256])
def test_dropout_pallas_interpret_matches_xla(causal, t):
    """The in-kernel hash masks are a pure function of (head, q, k, seed):
    the Pallas kernels and the XLA fallback must produce IDENTICAL dropout
    — forward and all three gradients — from the same seed."""
    q, k, v = _qkv(b=1, h=4, t=t, d=8, seed=11)
    rng = np.random.RandomState(12)
    do = rng.randn(*q.shape).astype(np.float32)
    scale = 1.0 / np.sqrt(q.shape[-1])
    args = (jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    kw = dict(causal=causal, scale=scale, dropout_rate=0.35,
              dropout_seed=1234)
    o_x, lse_x = attention.mha_fwd(*args, impl="xla", **kw)
    o_p, lse_p = attention.mha_fwd(*args, impl="pallas_interpret", **kw)
    np.testing.assert_allclose(np.asarray(o_p), np.asarray(o_x),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(lse_p), np.asarray(lse_x),
                               rtol=1e-5, atol=1e-6)
    ref = attention.mha_bwd(*args, o_x, lse_x, jnp.asarray(do), impl="xla",
                            **kw)
    got = attention.mha_bwd(*args, o_x, lse_x, jnp.asarray(do),
                            impl="pallas_interpret", **kw)
    for a, b, name in zip(got, ref, ("dq", "dk", "dv")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5, err_msg=name)


@pytest.mark.parametrize("impl", ["xla", "pallas_interpret"])
@pytest.mark.parametrize("causal", [False, True])
def test_dropout_primitive_matches_tape_twin_same_mask(impl, causal):
    """Exact fwd+bwd parity with a tape twin that applies the SAME hash
    mask to the materialized softmax probabilities — verifies the dropout
    calculus (normalizer unmasked, delta unchanged, masked dV/ds) against
    the tape's generic VJPs at identical masks."""
    b, h, t, d = 2, 2, 16, 8
    q, k, v = _qkv(b=b, h=h, t=t, d=d, seed=13)
    rng = np.random.RandomState(14)
    do = rng.randn(*q.shape).astype(np.float32)
    scale = 1.0 / np.sqrt(d)
    rate, seed = 0.4, 777

    qt, kt, vt = (Tensor(x, requires_grad=True) for x in (q, k, v))
    out_f = ops.flash_attention_(qt, kt, vt, causal=causal, scale=scale,
                                 impl=impl, dropout_rate=rate,
                                 dropout_rng=("pltpu_seed", seed))
    out_f.backward(Tensor(do))

    # tape twin with the same keep decisions applied post-softmax
    keep = np.asarray(attention._tile_keep_mask(
        seed, 0, 0, 0, b * h, t, t, t, t,
        attention._keep_thresh(rate))).reshape(b, h, t, t)
    q2, k2, v2 = (Tensor(x, requires_grad=True) for x in (q, k, v))
    scores = (q2 @ k2.transpose((0, 1, 3, 2))) * scale
    if causal:
        mask = jnp.where(
            jnp.asarray(np.tril(np.ones((t, t), np.float32))) == 1.0,
            0.0, -1e30)
        scores = scores + mask
    probs = ops.softmax_(scores, axis=-1)
    dropped = probs * (keep.astype(np.float32) / (1.0 - rate))
    out_t = dropped @ v2
    out_t.backward(Tensor(do))

    np.testing.assert_allclose(np.asarray(out_f.data),
                               np.asarray(out_t.data), rtol=1e-5, atol=1e-6)
    for a, bb, name in [(qt, q2, "dq"), (kt, k2, "dk"), (vt, v2, "dv")]:
        np.testing.assert_allclose(np.asarray(a.grad), np.asarray(bb.grad),
                                   rtol=1e-4, atol=1e-5, err_msg=name)


def test_dropout_statistics_and_seed_decorrelation():
    """Drop fraction tracks the rate; different seeds give different masks;
    the same seed replays identically; rate=0 is the exact no-op."""
    rate = 0.3
    bits = np.asarray(attention._tile_keep_mask(
        5, 0, 0, 0, 4, 64, 64, 64, 64, attention._keep_thresh(rate)))
    frac = 1.0 - bits.mean()
    assert abs(frac - rate) < 0.02, frac

    q, k, v = _qkv(b=1, h=2, t=32, d=8, seed=15)
    args = (jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    o1, _ = attention.mha_fwd(*args, impl="xla", dropout_rate=rate,
                              dropout_seed=1)
    o1b, _ = attention.mha_fwd(*args, impl="xla", dropout_rate=rate,
                               dropout_seed=1)
    o2, _ = attention.mha_fwd(*args, impl="xla", dropout_rate=rate,
                              dropout_seed=2)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o1b))
    assert not np.allclose(np.asarray(o1), np.asarray(o2))
    o0, _ = attention.mha_fwd(*args, impl="xla")
    o0r, _ = attention.mha_fwd(*args, impl="xla", dropout_rate=0.0,
                               dropout_seed=3)
    np.testing.assert_array_equal(np.asarray(o0), np.asarray(o0r))


# ------------------------------------------------- row-band direct kernels

def test_band_routing_selection():
    """Round-5 routing: whole plane when it fits; query row-bands with
    the full key axis resident when only a band fits; gridded
    online-softmax beyond. Backward bands only where measured to win
    (non-causal, or causal at t >= 4096 — the gridded kernels' causal
    tile skip beats the direct form at t=2048)."""
    assert attention._pick_band_rows(2048, 2048, 64, 5) == 512
    assert attention._pick_band_rows(4096, 4096, 64, 5) == 128
    assert attention._pick_band_rows(8192, 8192, 64, 5) is None
    assert attention._pick_band_rows(2048, 2050, 64, 5) is None  # unaligned


@pytest.mark.parametrize("causal", [False, True])
def test_band_fwd_interpret_matches_xla(causal):
    """t=2048 routes the forward to the row-band direct-softmax kernel
    (bq=512, whole key axis resident) — parity incl. dropout replay."""
    q, k, v = _qkv(b=1, h=2, t=2048, d=8, seed=21)
    args = (jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    kw = dict(causal=causal, scale=0.35, dropout_rate=0.25,
              dropout_seed=77)
    o_x, lse_x = attention.mha_fwd(*args, impl="xla", **kw)
    o_p, lse_p = attention.mha_fwd(*args, impl="pallas_interpret", **kw)
    np.testing.assert_allclose(np.asarray(o_p), np.asarray(o_x),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(lse_p), np.asarray(lse_x),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("causal,t", [(False, 2048), (True, 4096)])
def test_band_bwd_interpret_matches_xla(causal, t):
    """The banded backward engages non-causal at t=2048 and causal at
    t >= 4096 (measured routing) — dq/dk/dv parity incl. dropout."""
    q, k, v = _qkv(b=1, h=1, t=t, d=8, seed=22)
    rng = np.random.RandomState(23)
    do = rng.randn(*q.shape).astype(np.float32)
    args = (jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    kw = dict(causal=causal, scale=1.0 / np.sqrt(8), dropout_rate=0.2,
              dropout_seed=11)
    o, lse = attention.mha_fwd(*args, impl="xla", **kw)
    ref = attention.mha_bwd(*args, o, lse, jnp.asarray(do), impl="xla",
                            **kw)
    got = attention.mha_bwd(*args, o, lse, jnp.asarray(do),
                            impl="pallas_interpret", **kw)
    for a, b, name in zip(got, ref, ("dq", "dk", "dv")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4, err_msg=name)
