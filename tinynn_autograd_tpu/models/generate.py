"""Autoregressive decoding with a KV cache for the causal-LM family.

The serving-side counterpart of ``build_tiny_lm``: instead of re-running
the full [B, T] forward per emitted token (O(T^2) work per token, O(T^3)
per sequence), each step feeds ONE token through the blocks, appends its
per-block K/V to a static-shape cache, and attends the single query row
against the cache — the standard incremental-decoding scheme. The whole
generation loop is ONE ``lax.scan`` under ``jax.jit`` (static shapes,
positions masked by the running length), so the chip sees a single
dispatch per ``generate`` call.

Inference-only: this path reads the layers' parameters but never builds
tape state (no gradients through generation). Numerics match the
training forward exactly — the parity test decodes token-for-token
against repeated full ``net.forward`` argmax. No reference counterpart
(the reference has no sequence models or serving path).
"""

import numpy as np

import jax
import jax.numpy as jnp

from tinynn_autograd_tpu.nn.layers import (
    Dense, Embedding, PositionalEmbedding, Remat, TransformerBlock,
)

_NEG_INF = -1e30


def _gelu(x):
    c = np.sqrt(2.0 / np.pi).astype(np.float32)
    return 0.5 * x * (1.0 + jnp.tanh(c * (x + 0.044715 * x ** 3)))


def _ln(x, g, b, eps):
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) / jnp.sqrt(var + eps) * g + b


def _extract(net):
    """Pull the concrete param arrays of a build_tiny_lm-style net:
    Embedding, PositionalEmbedding, TransformerBlock*, Dense head."""
    emb = pos = head = None
    blocks = []
    heads = eps = None
    for layer in net.layers:
        if isinstance(layer, Remat):
            # training-only wrapper; decode reads the inner layer
            layer = layer.inner
        if isinstance(layer, Embedding):
            emb = layer.params["w"].data
        elif isinstance(layer, PositionalEmbedding):
            pos = layer.params["pos"].data
        elif isinstance(layer, TransformerBlock):
            if not layer.causal:
                raise ValueError(
                    "generate() needs causal TransformerBlocks (an acausal "
                    "block's output at position t depends on the future)")
            heads, eps = layer.num_heads, layer.eps
            blocks.append({k: v.data for k, v in layer.params.items()})
        elif isinstance(layer, Dense):
            head = {k: v.data for k, v in layer.params.items()}
        else:
            raise ValueError("generate() does not support layer %r"
                             % layer.name)
    if emb is None or pos is None or head is None or not blocks:
        raise ValueError("net is not a causal LM "
                         "(Embedding + PositionalEmbedding + blocks + head)")
    return emb, pos, blocks, head, heads, eps


def _block_step(bp, x, cache_k, cache_v, t, heads, eps, t_max):
    """One transformer block on ONE token x [B, D] at position t, reading
    and appending the block's KV cache [B, H, T_max, hd]."""
    b, d = x.shape
    hd = d // heads
    xn = _ln(x, bp["g1"], bp["be1"], eps)
    q = (xn @ bp["wq"]).reshape(b, heads, 1, hd)
    k = (xn @ bp["wk"]).reshape(b, heads, hd)
    v = (xn @ bp["wv"]).reshape(b, heads, hd)
    cache_k = jax.lax.dynamic_update_index_in_dim(cache_k, k, t, axis=2)
    cache_v = jax.lax.dynamic_update_index_in_dim(cache_v, v, t, axis=2)
    s = jnp.einsum("bhqd,bhkd->bhqk", q, cache_k,
                   preferred_element_type=jnp.float32) / np.sqrt(hd)
    pos_ids = jax.lax.broadcasted_iota(jnp.int32, s.shape, 3)
    s = jnp.where(pos_ids <= t, s, _NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    ctx = jnp.einsum("bhqk,bhkd->bhqd", p, cache_v,
                     preferred_element_type=jnp.float32)
    x = x + ctx.reshape(b, d) @ bp["wo"]
    yn = _ln(x, bp["g2"], bp["be2"], eps)
    x = x + _gelu(yn @ bp["w1"] + bp["b1"]) @ bp["w2"] + bp["b2"]
    return x, cache_k, cache_v


def generate(net, prompt_ids, n_new, temperature=0.0, rng=None):
    """Decode ``n_new`` tokens after ``prompt_ids`` [B, T0] (int ids).

    ``temperature=0`` is greedy argmax; otherwise softmax sampling at the
    given temperature with ``rng`` (a jax PRNG key; required). Returns
    int32 [B, T0 + n_new] — the prompt with the generated continuation.
    The position space is bounded by the net's PositionalEmbedding length;
    T0 + n_new must fit it.
    """
    emb, pos, blocks, head, heads, eps = _extract(net)
    t_max = pos.shape[1]
    prompt_ids = jnp.asarray(prompt_ids, jnp.int32)
    b, t0 = prompt_ids.shape
    if t0 + n_new > t_max:
        raise ValueError(
            "prompt (%d) + n_new (%d) exceeds the positional-embedding "
            "length (%d)" % (t0, n_new, t_max))
    if temperature and rng is None:
        raise ValueError("sampling (temperature > 0) needs rng=PRNGKey")
    d = emb.shape[1]
    hd = d // heads
    n_blocks = len(blocks)

    def token_logits(tok, t, caches):
        """Feed token ids [B] at position t through all blocks."""
        x = emb[tok] + pos[0, t]
        new_caches = []
        for l in range(n_blocks):
            ck, cv = caches[l]
            x, ck, cv = _block_step(blocks[l], x, ck, cv, t, heads, eps,
                                    t_max)
            new_caches.append((ck, cv))
        return x @ head["w"] + head["b"], new_caches

    def pick(logits, key):
        if not temperature:
            return jnp.argmax(logits, axis=-1).astype(jnp.int32)
        return jax.random.categorical(
            key, logits / temperature, axis=-1).astype(jnp.int32)

    @jax.jit
    def run(prompt, key):
        caches = [(jnp.zeros((b, heads, t_max, hd), jnp.float32),
                   jnp.zeros((b, heads, t_max, hd), jnp.float32))
                  for _ in range(n_blocks)]

        # prefill: feed the prompt token-by-token through the SAME cached
        # step (exact parity with decode; T0 is small for LM prompts here)
        def prefill_body(carry, t):
            caches, _last = carry
            logits, caches = token_logits(prompt[:, t], t, caches)
            return (caches, logits), ()

        (caches, logits), _ = jax.lax.scan(
            prefill_body,
            (caches, jnp.zeros((b, head["w"].shape[1]), jnp.float32)),
            jnp.arange(t0))

        def decode_body(carry, i):
            caches, logits, key = carry
            key, sub = jax.random.split(key)
            tok = pick(logits, sub)
            new_logits, caches = token_logits(tok, t0 + i, caches)
            return (caches, new_logits, key), tok

        key = key if key is not None else jax.random.PRNGKey(0)
        (_, _, _), toks = jax.lax.scan(
            decode_body, (caches, logits, key), jnp.arange(n_new))
        return toks.T  # [B, n_new]

    toks = run(prompt_ids, rng)
    return jnp.concatenate([prompt_ids, toks], axis=1)
