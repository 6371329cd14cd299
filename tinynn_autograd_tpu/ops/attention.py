"""Fused (flash-style) multi-head attention kernels: forward + backward.

The tape's generic attention path (TransformerBlock, nn/layers.py) is four
tape primitives — batched dot_, softmax_, dot_ — whose XLA lowering
materializes the [B, H, T, T] score/probability tensors in HBM twice per
direction. These kernels compute softmax(Q K^T * scale [+ causal mask]) V
with the ONLINE-softmax recurrence (Flash Attention 2): scores live only in
VMEM one [bq, bk] tile at a time, HBM sees just Q/K/V/O plus a per-row
logsumexp — O(T) memory instead of O(T^2), and the whole forward is ONE
kernel instead of ~5.

Backward is the standard recompute scheme, hand-derived (NO jax.grad — this
is a tape primitive like everything else, see ops.primitives.flash_attention_):

    D_i   = sum_d dO_id O_id
    p_ij  = exp(s_ij - L_i)                 (L = logsumexp, saved fwd)
    dV_j  = sum_i p_ij dO_i
    dp_ij = dO_i . V_j
    ds_ij = p_ij (dp_ij - D_i) * scale
    dQ_i  = sum_j ds_ij K_j
    dK_j  = sum_i ds_ij Q_i

run as two kernels (dQ gridded over query blocks, dK/dV over key blocks) so
each output is written exactly once — no cross-grid-step races.

Grid layout: heads are BATCHED per grid step (G heads of one [bq, bk] tile
at a time) because the per-grid-step pipeline cost (~1 us of DMA issue) would
dominate a one-head-per-step layout at short sequence lengths; G is sized to
a VMEM budget. All matmuls accumulate in f32 on the MXU. With bf16 inputs
the MXU runs its fast path (accumulation stays f32) — the standard TPU
mixed-precision recipe, opt-in via TransformerBlock(attn_precision="bf16").

Dispatch: Pallas on TPU (or interpret mode for CPU tests), with a pure-XLA
fallback implementing the identical math (including the saved logsumexp) for
CPU execution and odd shapes. No reference counterpart (the reference has no
attention); the tape contract it plugs into is ops.primitives.
"""

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tinynn_autograd_tpu.ops import kernels

_NEG_INF = -1e30
# VMEM working-set target used to pick how many heads share one grid step
_HEAD_BATCH_BUDGET = int(os.environ.get(
    "TINYNN_TPU_ATTN_HEAD_BUDGET", str(3 * 1024 * 1024)))
_BLOCK = int(os.environ.get("TINYNN_TPU_ATTN_BLOCK", "128"))


def _pick_head_batch(bh, bq, bk, d, n_bufs=6):
    """Heads per grid step: largest divisor of BH whose per-step blocks
    (q/k/v/o + the [bq,bk] score tile, double-buffered) fit the budget."""
    per_head = (4 * max(bq, bk) * max(d, 128) + bq * max(bk, 128)) * 4 * 2
    g = max(1, _HEAD_BATCH_BUDGET // (per_head * n_bufs // 4))
    g = min(g, bh)
    while bh % g:
        g -= 1
    return g


def _causal_mask(i, j, g, bq, bk):
    """[G, bq, bk] boolean: query row (global) >= key col (global)."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (g, bq, bk), 1) + i * bq
    cols = jax.lax.broadcasted_iota(jnp.int32, (g, bq, bk), 2) + j * bk
    return rows >= cols


def _sdot(a, b):
    """[G, m, d] x [G, n, d] -> [G, m, n] (contract d, batch G)."""
    return jax.lax.dot_general(
        a, b, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)


def _pdot(p, v):
    """[G, m, n] x [G, n, d] -> [G, m, d] (contract n, batch G)."""
    return jax.lax.dot_general(
        p, v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)


def _tdot(p, x):
    """[G, m, n] x [G, m, d] -> [G, n, d] (contract m, batch G)."""
    return jax.lax.dot_general(
        p, x, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)


# --------------------------------------------------------------- forward

def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, acc, m_scr, l_scr,
                *, scale, causal, bq, bk, g):
    i, j = pl.program_id(1), pl.program_id(2)

    @pl.when(j == 0)
    def _init():
        acc[...] = jnp.zeros_like(acc)
        m_scr[...] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[...] = jnp.zeros_like(l_scr)

    @pl.when(jnp.logical_or(not causal, j * bk <= i * bq + bq - 1))
    def _tile():
        q = q_ref[...]
        s = _sdot(q, k_ref[...]) * scale               # [G, bq, bk] f32
        if causal:
            s = jnp.where(_causal_mask(i, j, g, bq, bk), s, _NEG_INF)
        m_old = m_scr[...]                             # [G, bq, 1]
        m_new = jnp.maximum(m_old, jnp.max(s, axis=2, keepdims=True))
        alpha = jnp.exp(m_old - m_new)
        p = jnp.exp(s - m_new)
        l_scr[...] = l_scr[...] * alpha + jnp.sum(p, axis=2, keepdims=True)
        acc[...] = acc[...] * alpha + _pdot(p.astype(q.dtype), v_ref[...])
        m_scr[...] = m_new

    @pl.when(j == pl.num_programs(2) - 1)
    def _finish():
        l = l_scr[...]
        o_ref[...] = (acc[...] / l).astype(o_ref.dtype)
        lse_ref[...] = m_scr[...] + jnp.log(l)


def _fwd_pallas(q, k, v, scale, causal, interpret):
    bh, t, d = q.shape
    bq = bk = min(_BLOCK, t)
    g = _pick_head_batch(bh, bq, bk, d)
    nq, nk = t // bq, t // bk

    def head_spec(blk):
        return pl.BlockSpec((g, blk, d), lambda b, i, j, _n=None: (b, 0, 0),
                            memory_space=pltpu.VMEM)

    kern = functools.partial(_fwd_kernel, scale=scale, causal=causal,
                             bq=bq, bk=bk, g=g)
    o, lse = pl.pallas_call(
        kern,
        grid=(bh // g, nq, nk),
        in_specs=[
            pl.BlockSpec((g, bq, d), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, bk, d), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, bk, d), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, t, d), q.dtype),
            jax.ShapeDtypeStruct((bh, t, 1), jnp.float32),
        ],
        out_specs=[
            pl.BlockSpec((g, bq, d), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, bq, 1), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((g, bq, d), jnp.float32),
            pltpu.VMEM((g, bq, 1), jnp.float32),
            pltpu.VMEM((g, bq, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * t * t * d,
            bytes_accessed=4 * bh * t * d * 4,
            transcendentals=bh * t * t,
        ),
        interpret=interpret,
    )(q, k, v)
    return o, lse


# -------------------------------------------------------------- backward

def _dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref,
               dq_acc, *, scale, causal, bq, bk, g):
    i, j = pl.program_id(1), pl.program_id(2)

    @pl.when(j == 0)
    def _init():
        dq_acc[...] = jnp.zeros_like(dq_acc)

    @pl.when(jnp.logical_or(not causal, j * bk <= i * bq + bq - 1))
    def _tile():
        q = q_ref[...]
        k = k_ref[...]
        s = _sdot(q, k) * scale
        if causal:
            s = jnp.where(_causal_mask(i, j, g, bq, bk), s, _NEG_INF)
        p = jnp.exp(s - lse_ref[...])                  # [G, bq, bk]
        dp = _sdot(do_ref[...], v_ref[...])            # [G, bq, bk]
        ds = (p * (dp - delta_ref[...]) * scale).astype(q.dtype)
        dq_acc[...] += _pdot(ds, k)

    @pl.when(j == pl.num_programs(2) - 1)
    def _finish():
        dq_ref[...] = dq_acc[...].astype(dq_ref.dtype)


def _dkv_kernel(k_ref, v_ref, q_ref, do_ref, lse_ref, delta_ref,
                dk_ref, dv_ref, dk_acc, dv_acc, *, scale, causal, bq, bk, g):
    j, i = pl.program_id(1), pl.program_id(2)

    @pl.when(i == 0)
    def _init():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    @pl.when(jnp.logical_or(not causal, i * bq + bq - 1 >= j * bk))
    def _tile():
        q = q_ref[...]
        k = k_ref[...]
        do = do_ref[...]
        s = _sdot(q, k) * scale
        if causal:
            s = jnp.where(_causal_mask(i, j, g, bq, bk), s, _NEG_INF)
        p = jnp.exp(s - lse_ref[...])                  # [G, bq, bk]
        dv_acc[...] += _tdot(p.astype(q.dtype), do)
        dp = _sdot(do, v_ref[...])
        ds = (p * (dp - delta_ref[...]) * scale).astype(q.dtype)
        dk_acc[...] += _tdot(ds, q)

    @pl.when(i == pl.num_programs(2) - 1)
    def _finish():
        dk_ref[...] = dk_acc[...].astype(dk_ref.dtype)
        dv_ref[...] = dv_acc[...].astype(dv_ref.dtype)


def _bwd_pallas(q, k, v, do, lse, delta, scale, causal, interpret):
    bh, t, d = q.shape
    bq = bk = min(_BLOCK, t)
    g = _pick_head_batch(bh, bq, bk, d, n_bufs=8)
    nq, nk = t // bq, t // bk

    def qspec(blk, which):
        # which='q': block follows grid axis 1; 'k': grid axis 2
        if which == "q":
            return pl.BlockSpec((g, blk, d), lambda b, i, j: (b, i, 0),
                                memory_space=pltpu.VMEM)
        return pl.BlockSpec((g, blk, d), lambda b, i, j: (b, j, 0),
                            memory_space=pltpu.VMEM)

    def rspec(which):
        if which == "q":
            return pl.BlockSpec((g, bq, 1), lambda b, i, j: (b, i, 0),
                                memory_space=pltpu.VMEM)
        return pl.BlockSpec((g, bq, 1), lambda b, i, j: (b, j, 0),
                            memory_space=pltpu.VMEM)

    params = dict(scale=scale, causal=causal, bq=bq, bk=bk, g=g)
    dq = pl.pallas_call(
        functools.partial(_dq_kernel, **params),
        grid=(bh // g, nq, nk),
        in_specs=[qspec(bq, "q"), qspec(bk, "k"), qspec(bk, "k"),
                  qspec(bq, "q"), rspec("q"), rspec("q")],
        out_shape=jax.ShapeDtypeStruct((bh, t, d), q.dtype),
        out_specs=qspec(bq, "q"),
        scratch_shapes=[pltpu.VMEM((g, bq, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=6 * bh * t * t * d, bytes_accessed=6 * bh * t * d * 4,
            transcendentals=bh * t * t),
        interpret=interpret,
    )(q, k, v, do, lse, delta)

    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel, **params),
        grid=(bh // g, nk, nq),
        in_specs=[
            pl.BlockSpec((g, bk, d), lambda b, j, i: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, bk, d), lambda b, j, i: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, bq, d), lambda b, j, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, bq, d), lambda b, j, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, bq, 1), lambda b, j, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, bq, 1), lambda b, j, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((bh, t, d), q.dtype),
                   jax.ShapeDtypeStruct((bh, t, d), q.dtype)],
        out_specs=[
            pl.BlockSpec((g, bk, d), lambda b, j, i: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, bk, d), lambda b, j, i: (b, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[pltpu.VMEM((g, bk, d), jnp.float32),
                        pltpu.VMEM((g, bk, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=6 * bh * t * t * d, bytes_accessed=6 * bh * t * d * 4,
            transcendentals=bh * t * t),
        interpret=interpret,
    )(k, v, q, do, lse, delta)
    return dq, dk, dv


# ---------------------------------------------------------- XLA fallback

def _fwd_xla(q, k, v, scale, causal):
    """Identical math (incl. the saved logsumexp) in plain XLA — the CPU /
    odd-shape path. Scores DO materialize here; this is the correctness
    twin, not the fast path."""
    s = jnp.einsum("bqd,bkd->bqk", q, k,
                   preferred_element_type=jnp.float32) * scale
    if causal:
        t = q.shape[1]
        mask = np.tril(np.ones((t, t), np.bool_))
        s = jnp.where(mask, s, _NEG_INF)
    m = jnp.max(s, axis=2, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=2, keepdims=True)
    o = jnp.einsum("bqk,bkd->bqd", p.astype(q.dtype), v,
                   preferred_element_type=jnp.float32) / l
    return o.astype(q.dtype), m + jnp.log(l)


def _bwd_xla(q, k, v, do, lse, delta, scale, causal):
    s = jnp.einsum("bqd,bkd->bqk", q, k,
                   preferred_element_type=jnp.float32) * scale
    if causal:
        t = q.shape[1]
        mask = np.tril(np.ones((t, t), np.bool_))
        s = jnp.where(mask, s, _NEG_INF)
    p = jnp.exp(s - lse)
    dv = jnp.einsum("bqk,bqd->bkd", p.astype(q.dtype), do,
                    preferred_element_type=jnp.float32)
    dp = jnp.einsum("bqd,bkd->bqk", do, v,
                    preferred_element_type=jnp.float32)
    ds = (p * (dp - delta) * scale).astype(q.dtype)
    dq = jnp.einsum("bqk,bkd->bqd", ds, k,
                    preferred_element_type=jnp.float32)
    dk = jnp.einsum("bqk,bqd->bkd", ds, q,
                    preferred_element_type=jnp.float32)
    return dq.astype(q.dtype), dk.astype(q.dtype), dv.astype(q.dtype)


# ---------------------------------------------------------------- dispatch

def _resolve_impl(impl, t):
    if impl is None:
        impl = os.environ.get("TINYNN_TPU_ATTN_IMPL")
    if impl in ("pallas", "pallas_interpret", "xla"):
        return impl
    # auto: Pallas on TPU for block-divisible sequence lengths
    if (kernels._default_backend() == "tpu"
            and not os.environ.get("TINYNN_TPU_DISABLE_PALLAS")
            and (t % _BLOCK == 0 or t <= _BLOCK) and t % 8 == 0):
        return "pallas"
    return "xla"


def _fold(x):
    b, h, t, d = x.shape
    return x.reshape(b * h, t, d)


def mha_fwd(q, k, v, causal=False, scale=None, impl=None):
    """softmax(Q K^T * scale [+ causal mask]) V over [B, H, T, d] operands.
    Returns (o [B,H,T,d], lse [B,H,T,1] f32) — lse is the per-row
    logsumexp of the scaled scores, consumed by mha_bwd."""
    b, h, t, d = q.shape
    if scale is None:
        scale = 1.0 / np.sqrt(d)
    impl = _resolve_impl(impl, t)
    qf, kf, vf = _fold(q), _fold(k), _fold(v)
    if impl == "xla":
        o, lse = _fwd_xla(qf, kf, vf, scale, causal)
    else:
        o, lse = _fwd_pallas(qf, kf, vf, scale, causal,
                             interpret=(impl == "pallas_interpret"))
    return o.reshape(b, h, t, d), lse.reshape(b, h, t, 1)


def mha_bwd(q, k, v, o, lse, do, causal=False, scale=None, impl=None):
    """Hand-written VJP of mha_fwd (recompute scheme; see module docstring).
    Returns (dq, dk, dv) in the operands' shapes."""
    b, h, t, d = q.shape
    if scale is None:
        scale = 1.0 / np.sqrt(d)
    impl = _resolve_impl(impl, t)
    qf, kf, vf = _fold(q), _fold(k), _fold(v)
    of, dof = _fold(o), _fold(do)
    lsef = lse.reshape(b * h, t, 1)
    delta = jnp.sum(dof.astype(jnp.float32) * of.astype(jnp.float32),
                    axis=2, keepdims=True)
    if impl == "xla":
        dq, dk, dv = _bwd_xla(qf, kf, vf, dof, lsef, delta, scale, causal)
    else:
        dq, dk, dv = _bwd_pallas(qf, kf, vf, dof, lsef, delta, scale,
                                 causal, interpret=(impl == "pallas_interpret"))
    return (dq.reshape(b, h, t, d), dk.reshape(b, h, t, d),
            dv.reshape(b, h, t, d))
