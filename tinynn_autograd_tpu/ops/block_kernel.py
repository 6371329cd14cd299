"""Fused transformer-block FORWARD kernel (VERDICT r4 item 5 probe).

One Pallas kernel per grid step computes the whole pre-LN block —
LN1 -> QKV projections -> per-head attention -> output projection ->
residual -> LN2 -> MLP -> residual — for a slice of the batch, with every
weight VMEM-resident across the grid (dim-256 block: ~3.1 MB of weights).

Purpose: settle with DATA whether a fused block kernel can beat XLA's
per-op kernel chain at the bench transformer config (dim 256, T=128),
where round 4 dismissed the transformer megakernel by extrapolation from
the STANDALONE Pallas matmul rate. bench_block_probe.py times this against
the jitted XLA forward of the identical block and writes
BLOCK_PROBE.json; the dispatch story changes only if the kernel wins.

Layout discipline (same rules as ops/attention.py): every dot keeps the
MXU-native operand order — the one unavoidable relayout is the in-kernel
transpose of K ([G,T,D] -> [G,D,T]) per grid step, after which each
head's score and context matmuls are native slices. LN/softmax reductions
run along lanes (native). No dropout (probe only; TRAIN-path fusion would
reuse ops/attention.py's hash-mask machinery).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e30


def _mm(a, w):
    """[G, T, C] x [C, N] -> [G, T, N], native layout."""
    return jax.lax.dot_general(a, w, (((2,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _bdot(a, b):
    return jax.lax.dot_general(a, b, (((2,), (1,)), ((0,), (0,))),
                               preferred_element_type=jnp.float32)


def _ln(x, g, b, eps):
    mu = jnp.mean(x, axis=2, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=2, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * g + b


def _block_fwd_kernel(x_ref, wq_ref, wk_ref, wv_ref, wo_ref, w1_ref, b1_ref,
                      w2_ref, b2_ref, g1_ref, be1_ref, g2_ref, be2_ref,
                      out_ref, *, heads, hd, causal, eps, t):
    x = x_ref[...]                                     # [G, T, D]
    g = x.shape[0]
    xn = _ln(x, g1_ref[...], be1_ref[...], eps)
    q = _mm(xn, wq_ref[...])
    k = _mm(xn, wk_ref[...])
    v = _mm(xn, wv_ref[...])
    kt = jnp.swapaxes(k, 1, 2)                         # [G, D, T] relayout
    scale = 1.0 / np.sqrt(hd)
    ctx_heads = []
    for h in range(heads):
        sl = slice(h * hd, (h + 1) * hd)
        s = _bdot(q[:, :, sl], kt[:, sl, :]) * scale   # [G, T, T] native
        if causal:
            rows = jax.lax.broadcasted_iota(jnp.int32, (g, t, t), 1)
            cols = jax.lax.broadcasted_iota(jnp.int32, (g, t, t), 2)
            s = jnp.where(rows >= cols, s, _NEG)
        m = jnp.max(s, axis=2, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=2, keepdims=True)
        ctx_heads.append(_bdot(p.astype(x.dtype), v[:, :, sl]))
    ctx = jnp.concatenate(ctx_heads, axis=2)           # [G, T, D]
    x2 = x + _mm(ctx, wo_ref[...])
    yn = _ln(x2, g2_ref[...], be2_ref[...], eps)
    # tanh-approx GELU — matches the tape's ops.gelu_ exactly
    y = jax.nn.gelu(_mm(yn, w1_ref[...]) + b1_ref[...], approximate=True)
    out_ref[...] = (x2 + _mm(y, w2_ref[...]) + b2_ref[...]).astype(
        out_ref.dtype)


def block_fwd_pallas(x, params, heads, causal=False, eps=1e-5,
                     batch_block=4, interpret=False):
    """Fused forward of one pre-LN TransformerBlock. ``x``: [B, T, D];
    ``params``: dict with wq/wk/wv/wo [D,D], w1 [D,Hd], b1 [1,Hd],
    w2 [Hd,D], b2 [1,D], g1/be1/g2/be2 [1,D] (the nn.layers layout)."""
    b, t, d = x.shape
    hd = d // heads
    g = min(batch_block, b)
    while b % g:
        g -= 1
    kern = functools.partial(_block_fwd_kernel, heads=heads, hd=hd,
                             causal=causal, eps=eps, t=t)
    full = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                      memory_space=pltpu.VMEM)
    names = ("wq", "wk", "wv", "wo", "w1", "b1", "w2", "b2",
             "g1", "be1", "g2", "be2")
    weight_specs = [full(tuple(np.asarray(params[n]).shape)) for n in names]
    hidden = params["w1"].shape[1]
    return pl.pallas_call(
        kern,
        grid=(b // g,),
        in_specs=[pl.BlockSpec((g, t, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)] + weight_specs,
        out_shape=jax.ShapeDtypeStruct((b, t, d), x.dtype),
        out_specs=pl.BlockSpec((g, t, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * t * (4 * d * d + 2 * t * d + 2 * d * hidden),
            bytes_accessed=(b * t * d * 2 + 4 * d * d
                            + 2 * d * hidden) * 4,
            transcendentals=b * t * (t + hidden)),
        interpret=interpret,
    )(x, *[params[n] for n in names])
