"""Pallas TPU kernels for the LSTM recurrence (ops/recurrent.py's hot path).

Why a kernel: after the cuDNN-style hoisting (ops/recurrent.py), the
recurrence's remaining cost is T dependent [B, H] x [H, 4H] matmuls each
way — and a dependent matmul at XLA kernel granularity costs ~1.75us on
this chip while the SAME matmul inside one Pallas kernel pipelines at
<=0.17us (BENCHMARKS.md "Where the walls are", round 3). Running the whole
time loop inside ONE kernel therefore attacks the chain directly, the same
argument that built the fused-epoch megakernel.

Design (mirrors ops/streaming_epoch.py's grid-streaming pattern):

- **Forward kernel** — grid over time-chunks of C steps. Each grid step's
  BlockSpec streams the hoisted input projection xp[t:t+C] [C, B, 4H]
  HBM->VMEM (Pallas double-buffers the next chunk behind the current
  chunk's compute) while the recurrent state (h, c) lives in VMEM scratch
  across grid steps and wh [H, 4H] stays VMEM-resident (constant index
  map). Per step: one MXU matmul + gate elementwise. Emits h, c and the
  four gates (packed [C, B, 4H]) — exactly what the backward needs, so
  nothing is recomputed.

- **Backward kernel** — grid reversed over the same chunks, carrying
  (dh, dc) in scratch with wh^T resident. Emits the per-step gate
  cotangent dz [C, B, 4H]; the weight/input/bias cotangents stay as three
  big batched matmuls OUTSIDE the kernel (ops/recurrent.py joint_bwd) —
  they are not on the serial chain. The final (dh0, dc0) carry is written
  on the last grid step.

- ``reverse=True`` (the bidirectional twin) flips the grid index maps and
  the in-chunk step order in BOTH kernels; the math is untouched.

Eligibility: B a multiple of 8 (sublane), H a multiple of 128 (lane),
f32. Chunk C is the largest divisor of T whose double-buffered working
set fits the VMEM budget. interpret=True runs the same kernels on CPU for
the parity tests. No reference counterpart (the reference has no
recurrent machinery); no jax.grad anywhere.
"""

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BUDGET_MB = float(os.environ.get("TINYNN_RNN_VMEM_BUDGET_MB", "20"))
_VMEM_BUDGET = int(_BUDGET_MB * 1024 * 1024)


def _compiler_params():
    return pltpu.CompilerParams(dimension_semantics=("arbitrary",))


def supports(B, H, dtype):
    return dtype == jnp.float32 and B % 8 == 0 and H % 128 == 0


def _pick_chunk(T, B, H, n_streams):
    """Largest divisor of T (<=32) whose double-buffered per-chunk streams
    (n_streams arrays of [C, B, H]-equivalent traffic, in H units) fit the
    VMEM budget next to wh and the state scratch."""
    resident = H * 4 * H * 4 + 4 * B * H * 4
    per_c = n_streams * B * H * 4
    for c in range(min(T, 32), 0, -1):
        if T % c == 0 and 2 * c * per_c + resident <= _VMEM_BUDGET:
            return c
    return None


def _fwd_kernel(C, H, reverse, h0_ref, c0_ref, wh_ref, xp_ref,
                hs_ref, cs_ref, gates_ref, h_scr, c_scr):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        h_scr[...] = h0_ref[...]
        c_scr[...] = c0_ref[...]

    for j in range(C):
        jj = C - 1 - j if reverse else j
        z = xp_ref[jj] + jnp.dot(h_scr[...], wh_ref[...],
                                 preferred_element_type=jnp.float32)
        ig = jax.nn.sigmoid(z[:, :H])
        fg = jax.nn.sigmoid(z[:, H:2 * H])
        gg = jnp.tanh(z[:, 2 * H:3 * H])
        og = jax.nn.sigmoid(z[:, 3 * H:])
        c = fg * c_scr[...] + ig * gg
        h = og * jnp.tanh(c)
        gates_ref[jj] = jnp.concatenate([ig, fg, gg, og], axis=-1)
        cs_ref[jj] = c
        hs_ref[jj] = h
        h_scr[...] = h
        c_scr[...] = c


def lstm_fwd_pallas(xp, wh, h0, c0, reverse=False, interpret=False):
    """xp [T, B, 4H] (hoisted input projection incl. bias), wh [H, 4H],
    h0/c0 [B, H] -> (hs, cs [T, B, H], gates [T, B, 4H])."""
    T, B, H4 = xp.shape
    H = H4 // 4
    C = _pick_chunk(T, B, H, n_streams=10)  # xp 4H + h,c 2H + gates 4H
    n = T // C

    def tmap(i):
        return ((n - 1 - i) if reverse else i, 0, 0)

    def cmap(i):
        return (0, 0)

    return pl.pallas_call(
        functools.partial(_fwd_kernel, C, H, reverse),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((B, H), cmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H), cmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, 4 * H), cmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((C, B, 4 * H), tmap, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, B, H), jnp.float32),
            jax.ShapeDtypeStruct((T, B, H), jnp.float32),
            jax.ShapeDtypeStruct((T, B, 4 * H), jnp.float32),
        ],
        out_specs=[
            pl.BlockSpec((C, B, H), tmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((C, B, H), tmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((C, B, 4 * H), tmap, memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[pltpu.VMEM((B, H), jnp.float32),
                        pltpu.VMEM((B, H), jnp.float32)],
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(h0, c0, wh, xp)


def _bwd_kernel(C, H, n, reverse, whT_ref, gt_ref, gates_ref, cs_ref,
                cprev_ref, dzs_ref, dh0_ref, dc0_ref, dh_scr, dc_scr):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        dh_scr[...] = jnp.zeros_like(dh_scr[...])
        dc_scr[...] = jnp.zeros_like(dc_scr[...])

    for j in range(C):
        # the backward walks time in the direction OPPOSITE the forward
        jj = j if reverse else C - 1 - j
        g4 = gates_ref[jj]
        ig, fg = g4[:, :H], g4[:, H:2 * H]
        gg, og = g4[:, 2 * H:3 * H], g4[:, 3 * H:]
        tc = jnp.tanh(cs_ref[jj])
        dh = gt_ref[jj] + dh_scr[...]
        do = dh * tc
        dc = dh * og * (1.0 - tc * tc) + dc_scr[...]
        di = dc * gg
        dg = dc * ig
        df = dc * cprev_ref[jj]
        dz = jnp.concatenate(
            [di * ig * (1.0 - ig),
             df * fg * (1.0 - fg),
             dg * (1.0 - gg * gg),
             do * og * (1.0 - og)], axis=-1)
        dzs_ref[jj] = dz
        dh_scr[...] = jnp.dot(dz, whT_ref[...],
                              preferred_element_type=jnp.float32)
        dc_scr[...] = dc * fg

    @pl.when(i == n - 1)
    def _():
        dh0_ref[...] = dh_scr[...]
        dc0_ref[...] = dc_scr[...]


def lstm_bwd_pallas(gt, gates, cs, cprev, whT, reverse=False,
                    interpret=False):
    """gt [T, B, H] (output cotangent), gates [T, B, 4H], cs/cprev
    [T, B, H], whT [4H, H] -> (dzs [T, B, 4H], dh0, dc0 [B, H])."""
    T, B, H = gt.shape
    C = _pick_chunk(T, B, H, n_streams=11)  # gt + gates 4H + cs + cprev + dz 4H
    n = T // C

    # grid runs time in the direction opposite the forward pass
    def tmap(i):
        return (i if reverse else (n - 1 - i), 0, 0)

    def cmap(i):
        return (0, 0)

    return pl.pallas_call(
        functools.partial(_bwd_kernel, C, H, n, reverse),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((4 * H, H), cmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((C, B, H), tmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((C, B, 4 * H), tmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((C, B, H), tmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((C, B, H), tmap, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, B, 4 * H), jnp.float32),
            jax.ShapeDtypeStruct((B, H), jnp.float32),
            jax.ShapeDtypeStruct((B, H), jnp.float32),
        ],
        out_specs=[
            pl.BlockSpec((C, B, 4 * H), tmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H), cmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H), cmap, memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[pltpu.VMEM((B, H), jnp.float32),
                        pltpu.VMEM((B, H), jnp.float32)],
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(whT, gt, gates, cs, cprev)


def pickable(T, B, H):
    """True when both LSTM kernels can tile this shape inside the budget."""
    return (_pick_chunk(T, B, H, n_streams=10) is not None
            and _pick_chunk(T, B, H, n_streams=11) is not None)


# ------------------------------------------------------------------- GRU


def _gru_fwd_kernel(C, H, reverse, h0_ref, wh_ref, ap_ref,
                    hs_ref, gates_ref, un_ref, h_scr):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        h_scr[...] = h0_ref[...]

    for j in range(C):
        jj = C - 1 - j if reverse else j
        u = jnp.dot(h_scr[...], wh_ref[...],
                    preferred_element_type=jnp.float32)
        a = ap_ref[jj]
        z = jax.nn.sigmoid(a[:, :H] + u[:, :H])
        r = jax.nn.sigmoid(a[:, H:2 * H] + u[:, H:2 * H])
        un = u[:, 2 * H:]
        n_ = jnp.tanh(a[:, 2 * H:] + r * un)
        h = (1.0 - z) * n_ + z * h_scr[...]
        gates_ref[jj] = jnp.concatenate([z, r, n_], axis=-1)
        un_ref[jj] = un
        hs_ref[jj] = h
        h_scr[...] = h


def gru_fwd_pallas(ap, wh, h0, reverse=False, interpret=False):
    """ap [T, B, 3H] (hoisted input projection incl. bias), wh [H, 3H],
    h0 [B, H] -> (hs [T, B, H], gates (z,r,n) [T, B, 3H], un [T, B, H])."""
    T, B, H3 = ap.shape
    H = H3 // 3
    C = _pick_chunk(T, B, H, n_streams=8)  # ap 3H + hs H + gates 3H + un H
    n = T // C

    def tmap(i):
        return ((n - 1 - i) if reverse else i, 0, 0)

    def cmap(i):
        return (0, 0)

    return pl.pallas_call(
        functools.partial(_gru_fwd_kernel, C, H, reverse),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((B, H), cmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, 3 * H), cmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((C, B, 3 * H), tmap, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, B, H), jnp.float32),
            jax.ShapeDtypeStruct((T, B, 3 * H), jnp.float32),
            jax.ShapeDtypeStruct((T, B, H), jnp.float32),
        ],
        out_specs=[
            pl.BlockSpec((C, B, H), tmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((C, B, 3 * H), tmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((C, B, H), tmap, memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[pltpu.VMEM((B, H), jnp.float32)],
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(h0, wh, ap)


def _gru_bwd_kernel(C, H, n, reverse, whT_ref, gt_ref, hprev_ref,
                    gates_ref, un_ref, das_ref, dus_ref, dh0_ref, dh_scr):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        dh_scr[...] = jnp.zeros_like(dh_scr[...])

    for j in range(C):
        jj = j if reverse else C - 1 - j
        g3 = gates_ref[jj]
        z, r, n_ = g3[:, :H], g3[:, H:2 * H], g3[:, 2 * H:]
        un = un_ref[jj]
        dh = gt_ref[jj] + dh_scr[...]
        dz_gate = dh * (hprev_ref[jj] - n_)
        dn_pre = dh * (1.0 - z) * (1.0 - n_ * n_)
        dr = dn_pre * un
        dun = dn_pre * r
        daz = dz_gate * z * (1.0 - z)
        dar = dr * r * (1.0 - r)
        da = jnp.concatenate([daz, dar, dn_pre], axis=-1)
        du = jnp.concatenate([daz, dar, dun], axis=-1)
        das_ref[jj] = da
        dus_ref[jj] = du
        dh_scr[...] = dh * z + jnp.dot(du, whT_ref[...],
                                       preferred_element_type=jnp.float32)

    @pl.when(i == n - 1)
    def _():
        dh0_ref[...] = dh_scr[...]


def gru_bwd_pallas(gt, hprev, gates, un, whT, reverse=False,
                   interpret=False):
    """gt [T, B, H], hprev [T, B, H] (direction-aware shift of hs),
    gates (z,r,n) [T, B, 3H], un [T, B, H], whT [3H, H] ->
    (das, dus [T, B, 3H], dh0 [B, H])."""
    T, B, H = gt.shape
    C = _pick_chunk(T, B, H, n_streams=12)
    n = T // C

    def tmap(i):
        return (i if reverse else (n - 1 - i), 0, 0)

    def cmap(i):
        return (0, 0)

    return pl.pallas_call(
        functools.partial(_gru_bwd_kernel, C, H, n, reverse),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((3 * H, H), cmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((C, B, H), tmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((C, B, H), tmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((C, B, 3 * H), tmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((C, B, H), tmap, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, B, 3 * H), jnp.float32),
            jax.ShapeDtypeStruct((T, B, 3 * H), jnp.float32),
            jax.ShapeDtypeStruct((B, H), jnp.float32),
        ],
        out_specs=[
            pl.BlockSpec((C, B, 3 * H), tmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((C, B, 3 * H), tmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H), cmap, memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[pltpu.VMEM((B, H), jnp.float32)],
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(whT, gt, hprev, gates, un)


def gru_pickable(T, B, H):
    """True when both GRU kernels can tile this shape inside the budget."""
    return (_pick_chunk(T, B, H, n_streams=8) is not None
            and _pick_chunk(T, B, H, n_streams=12) is not None)
