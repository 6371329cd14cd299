"""KV-cache autoregressive decoding (models/generate.py): token-for-token
parity with repeated full forwards, sampling shapes, and guards."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tinynn_autograd_tpu.core.tensor import Tensor
from tinynn_autograd_tpu.models import build_tiny_lm, build_tiny_transformer
from tinynn_autograd_tpu.models.generate import generate
from tinynn_autograd_tpu.utils.seeder import random_seed


def _lm(seed=0, vocab=17, seq=12, dim=16, heads=4, depth=2):
    random_seed(seed)
    net = build_tiny_lm(vocab=vocab, seq_len=seq, dim=dim, heads=heads,
                        depth=depth)
    net.init((2, seq))
    return net, vocab, seq


def test_greedy_generate_matches_full_forward():
    net, vocab, seq = _lm()
    rng = np.random.RandomState(0)
    prompt = rng.randint(0, vocab, (2, 4))
    n_new = 6

    out = np.asarray(generate(net, prompt, n_new))
    assert out.shape == (2, 4 + n_new)
    np.testing.assert_array_equal(out[:, :4], prompt)

    # oracle: re-run the FULL training forward after each emitted token
    # (the fixed-length net wants [B, seq]; zero-pad the tail — causality
    # makes positions > t-1 irrelevant to position t-1's logits)
    ids = prompt.copy()
    for _ in range(n_new):
        t = ids.shape[1]
        full = np.zeros((ids.shape[0], seq), ids.dtype)
        full[:, :t] = ids
        logits = net.forward(Tensor(jnp.asarray(full))).data
        nxt = np.asarray(jnp.argmax(logits[:, t - 1], axis=-1))
        ids = np.concatenate([ids, nxt[:, None].astype(ids.dtype)], axis=1)
    np.testing.assert_array_equal(out, ids)


def test_sampling_shapes_and_determinism():
    net, vocab, _ = _lm(seed=1)
    prompt = np.zeros((3, 2), np.int64)
    key = jax.random.PRNGKey(7)
    a = np.asarray(generate(net, prompt, 5, temperature=1.0, rng=key))
    b = np.asarray(generate(net, prompt, 5, temperature=1.0, rng=key))
    np.testing.assert_array_equal(a, b)  # same key, same draw
    assert a.shape == (3, 7)
    assert (a >= 0).all() and (a < vocab).all()
    c = np.asarray(generate(net, prompt, 5, temperature=1.0,
                            rng=jax.random.PRNGKey(8)))
    assert not np.array_equal(a, c)  # different key diverges


def test_generate_guards():
    net, vocab, seq = _lm(seed=2)
    with pytest.raises(ValueError, match="positional-embedding"):
        generate(net, np.zeros((1, seq), np.int64), 1)
    with pytest.raises(ValueError, match="rng"):
        generate(net, np.zeros((1, 2), np.int64), 2, temperature=0.7)

    random_seed(3)
    acausal = build_tiny_transformer(vocab=8, seq_len=8, dim=16, heads=4,
                                     depth=1, num_out=8)
    acausal.init((1, 8))
    with pytest.raises(ValueError, match="causal"):
        generate(acausal, np.zeros((1, 2), np.int64), 2)


def test_generate_after_training_produces_grammar():
    """End-to-end: train the causal LM on a deterministic cyclic grammar
    (next token = (tok + 1) % vocab), then decoding must continue it."""
    from tinynn_autograd_tpu.nn.losses import SoftmaxCrossEntropyLoss
    from tinynn_autograd_tpu.nn.model import Model
    from tinynn_autograd_tpu.nn.optimizer import Adam

    vocab, seq = 8, 10
    random_seed(5)
    net = build_tiny_lm(vocab=vocab, seq_len=seq, dim=32, heads=4, depth=1)
    model = Model(net, SoftmaxCrossEntropyLoss(), Adam(1e-2))
    rng = np.random.RandomState(0)
    starts = rng.randint(0, vocab, 64)
    x = (starts[:, None] + np.arange(seq)[None, :]) % vocab
    y = np.eye(vocab, dtype=np.float32)[(x + 1) % vocab].reshape(
        64, seq, vocab)
    for _ in range(60):
        model.train_step(x, y.reshape(64, seq, vocab))
    prompt = np.array([[3, 4, 5], [0, 1, 2]], np.int64)
    out = np.asarray(generate(net, prompt, 4))
    want = np.array([[3, 4, 5, 6, 7, 0, 1], [0, 1, 2, 3, 4, 5, 6]])
    np.testing.assert_array_equal(out, want)


def test_generate_through_remat_wrapped_lm():
    """Decode unwraps nn.layers.Remat (a training-only wrapper): a
    remat-built LM generates token-for-token identically to its plain
    twin (same init seeds via the shared global stream reset)."""
    ids = np.random.RandomState(3).randint(0, 17, (2, 5))
    outs = []
    for remat in (False, True):
        random_seed(9)
        net = build_tiny_lm(vocab=17, seq_len=12, dim=16, heads=4,
                            depth=2, remat=remat)
        net.init((2, 12))
        outs.append(np.asarray(generate(net, ids, 5)))
    np.testing.assert_array_equal(outs[0], outs[1])
