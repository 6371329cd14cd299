"""Streaming fused train step: HBM->VMEM weight streaming for models whose
parameters do NOT fit in VMEM (the fused-epoch megakernel's ~6MB budget,
ops/fused_epoch.py:41).

Target family: the DenseStack deep body (driver config #3 — 100-layer MLP,
~26MB of stacked weights + 2x that in Adam moments). Design:

- **Forward kernel** (grid over layers): each grid step's BlockSpec streams
  ONE layer's w[l] [W,W] HBM->VMEM — Pallas double-buffers the next layer's
  weights behind the current layer's matmul automatically — while the
  running activation h lives in VMEM scratch across grid steps. Only the
  per-layer activation OUTPUT a[l] is written back to HBM (one array, not
  the three the scanned path saves: h_in and z are reconstructed from a —
  h_in[l] = a[l-1], and every supported act's derivative is a function of
  its output alone).

- **Backward+update kernel** (grid reversed over layers): streams w[l] and
  the optimizer slots m/v[l] in, computes dz/dW/db/dh on-chip, and applies
  the optimizer's own per-leaf update rule (``optimizer._step_leaf`` — the
  exact math every other path uses) IN the kernel, writing updated
  w/slots straight back out. The gradient stack therefore never exists in
  HBM: per step the body's HBM traffic is read w (x2: fwd+bwd), read
  slots, write w+slots, and the single activation stack each way — the
  algorithmic minimum for an f32 optimizer-per-step regime, ~40% less than
  the scanned path (which also round-trips a dW stack and re-reads w in
  the optimizer pass).

The small prefix (input projection) and suffix (classifier head) layers run
on the ordinary tape outside the kernels; their cotangents connect through
``d_h_last`` (seeded into the suffix tape leaf) and ``d_h0`` (the backward
kernel's final carry, seeded back into the prefix tape).

No jax.grad anywhere. Kernels follow the double-buffering guidance of the
TPU Pallas guide; interpret=True runs the same kernels on CPU for tests.
"""

import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tinynn_autograd_tpu.core.tensor import Tensor

# VMEM working-set budget for layers-per-block sizing, env-tunable.
# Measured on v5e (L=100, W=256, B=128, 2000-step dispatches): the budget
# barely moves the step time (SGD 71/61/65 us at 6/24/11 MB; Adam flat at
# ~286 us for C_bwd of 1, 2, or 5), because XLA's memory-space assignment
# already keeps the hot stacks VMEM-resident between kernel calls — which
# is also why OVERRIDING CompilerParams.vmem_limit_bytes upward is pure
# harm (2.7x slower at identical block sizes: the scoped reservation
# evicts XLA's residency). So: moderate budget, NO limit override.
_BUDGET_MB = float(os.environ.get("TINYNN_STREAM_VMEM_BUDGET_MB", "24"))
_VMEM_BUDGET = int(_BUDGET_MB * 1024 * 1024)
_VMEM_LIMIT_MB = float(os.environ.get("TINYNN_STREAM_VMEM_LIMIT_MB", "0"))

# Stochastic-rounding salt spaces must be disjoint across every path that
# rounds in the same step with the same t: BaseOptimizer.update salts by
# leaf index (small ints), the stacked-bias update below uses BIAS_SALT,
# and the in-kernel per-layer weight updates use KERNEL_SALT_BASE + layer.
BIAS_SALT = 1 << 19
KERNEL_SALT_BASE = 1 << 20


def _compiler_params(n_grid_dims=1):
    kwargs = {"dimension_semantics": ("arbitrary",) * n_grid_dims}
    if _VMEM_LIMIT_MB:
        kwargs["vmem_limit_bytes"] = int(_VMEM_LIMIT_MB * 1024 * 1024)
    return pltpu.CompilerParams(**kwargs)

# activation forward + derivative-from-OUTPUT (a = act(z)):
#   relu: a > 0 (z == 0 ties are measure-zero; the tape path uses z >= 0)
_ACTS = {
    "relu": (lambda z: jnp.maximum(z, 0.0), lambda a: (a > 0.0)),
    "tanh": (jnp.tanh, lambda a: 1.0 - a * a),
    "sigmoid": (jax.nn.sigmoid, lambda a: a * (1.0 - a)),
    "linear": (lambda z: z, lambda a: jnp.ones_like(a)),
}


def _find_stack(net):
    from tinynn_autograd_tpu.nn.layers import DenseStack

    idxs = [i for i, l in enumerate(net.layers)
            if isinstance(l, DenseStack)]
    return idxs[0] if len(idxs) == 1 else None


def supports(net, params_tree, optimizer):
    """Eligible: exactly one DenseStack (any supported act) surrounded by
    Dense/Activation/Flatten layers, width a multiple of 128 (MXU tiling),
    and any optimizer (all seven expose the per-leaf ``_step_leaf`` rule the
    backward kernel re-traces)."""
    from tinynn_autograd_tpu.nn.layers import Activation, Dense, Flatten

    stack_idx = _find_stack(net)
    if stack_idx is None:
        return False
    stack = net.layers[stack_idx]
    if stack.activation not in _ACTS:
        return False
    if stack.width is None or stack.width % 128:
        return False
    for i, layer in enumerate(net.layers):
        if i == stack_idx:
            continue
        if not isinstance(layer, (Dense, Activation, Flatten)):
            return False
        if getattr(layer, "compute_dtype", None) is not None:
            # the streaming kernels re-implement layer math in f32;
            # mixed-precision nets take the scanned tier (see
            # fused_epoch.supports)
            return False
    if getattr(optimizer, "clip_norm", None) is not None:
        # global-norm clipping needs ALL gradients before ANY update; the
        # streaming backward applies per-leaf updates in-kernel as each
        # layer's gradient is produced — fall back to the scanned tier
        return False
    return hasattr(optimizer, "_step_leaf")


def _pick_block(L, per_layer_bytes, extra_bytes=0,
                budget=_VMEM_BUDGET):
    """Largest layers-per-block divisor of L whose double-buffered working
    set stays inside the VMEM budget. Bigger blocks amortize the fixed
    per-grid-step pipeline cost (~microseconds of DMA issue latency per
    step dominates when blocks are small — measured on v5e)."""
    for c in range(min(L, 32), 0, -1):
        if L % c == 0 and 2 * c * per_layer_bytes + extra_bytes <= budget:
            return c
    return 1


def _pick_block_fwd(L, B, W):
    # streams w+b in and acts out; carry h in scratch
    per_layer = (W * W + W + B * W) * 4
    return _pick_block(L, per_layer, extra_bytes=B * W * 4)


def _pick_block_bwd(L, B, W, n_slots, slot_bytes=4):
    # streams w + slots in/out, acts in, db out; dh carry in scratch
    per_layer = ((W * W * 4 + n_slots * W * W * slot_bytes) * 2
                 + (B * W + W) * 4)
    return _pick_block(L, per_layer, extra_bytes=5 * B * W * 4)


def _build_forward(L, B, W, act_name, C, interpret):
    act_fn, _ = _ACTS[act_name]

    def kernel(h0_ref, w_ref, b_ref, acts_ref, h_scr):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            h_scr[...] = h0_ref[...]

        for j in range(C):
            z = jnp.dot(h_scr[...], w_ref[j],
                        preferred_element_type=jnp.float32) + b_ref[j]
            a = act_fn(z)
            acts_ref[j] = a
            h_scr[...] = a

    return pl.pallas_call(
        kernel,
        grid=(L // C,),
        in_specs=[
            pl.BlockSpec((B, W), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, W, W), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, 1, W), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=jax.ShapeDtypeStruct((L, B, W), jnp.float32),
        out_specs=pl.BlockSpec((C, B, W), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((B, W), jnp.float32)],
        compiler_params=_compiler_params(),
        interpret=interpret,
    )


def _build_backward(L, B, W, act_name, optimizer, C, interpret):
    _, act_grad = _ACTS[act_name]
    slot_names = optimizer.slot_names
    n_slots = len(slot_names)
    slot_dt = optimizer.slot_dtype or jnp.float32
    wd = optimizer.weight_decay
    n_blocks = L // C

    def kernel(*refs):
        (t_ref, lr_ref, h0_ref, dlast_ref, aprev1_ref, acts_ref,
         w_ref) = refs[:7]
        rest = refs[7:]
        slot_w_in = rest[:n_slots]
        rest = rest[n_slots:]
        new_w_ref = rest[0]
        new_slot_w = rest[1:1 + n_slots]
        db_ref = rest[1 + n_slots]
        dh0_ref = rest[2 + n_slots]
        dh_scr = rest[3 + n_slots]

        i = pl.program_id(0)
        s = ((n_blocks - 1) - i) * C   # first layer of this block

        @pl.when(i == 0)
        def _():
            dh_scr[...] = dlast_ref[...]

        t = t_ref[0, 0]
        lr = lr_ref[0, 0]
        dh = dh_scr[...]
        for j in reversed(range(C)):
            a = acts_ref[j]
            if j > 0:
                h_in = acts_ref[j - 1]
            else:
                # block's first layer: a[s-1] streamed separately; layer 0
                # of the whole stack reads the prefix output h0 instead
                h_in = jnp.where(s == 0, h0_ref[...], aprev1_ref[0])

            dz = dh * act_grad(a)
            # dh first: it is the serial dependency chain (feeds the next
            # layer's dz); dw/db/optimizer work is off-path and can overlap
            # behind it. Must use the PRE-update weights.
            dh = jnp.dot(dz, w_ref[j].T,
                         preferred_element_type=jnp.float32)
            dw = jnp.dot(h_in.T, dz, preferred_element_type=jnp.float32)
            db_ref[j] = jnp.sum(dz, axis=0, keepdims=True)

            sw = {n: slot_w_in[k][j] for k, n in enumerate(slot_names)}
            # step_leaf upcasts bf16-stored slots to f32 for the math and
            # rounds the new values back to the storage dtype. Salt space:
            # KERNEL_SALT_BASE + global layer index — disjoint from the
            # leaf-index salts BaseOptimizer.update uses for the small
            # prefix/suffix leaves in the SAME step (a bare s+j could
            # collide with leaf i there, giving two same-shape tensors an
            # identical per-element rounding bit stream)
            step_w, new_sw = optimizer.step_leaf(dw, lr, t, sw,
                                                 salt=KERNEL_SALT_BASE + s + j)
            if wd:
                step_w = step_w - wd * w_ref[j]
            new_w_ref[j] = w_ref[j] + step_w
            for k, n in enumerate(slot_names):
                new_slot_w[k][j] = new_sw[n]

        dh_scr[...] = dh
        dh0_ref[...] = dh      # resident; final flush = layer 0's dh

    def w_spec():
        return pl.BlockSpec((C, W, W), lambda i: ((n_blocks - 1) - i, 0, 0),
                            memory_space=pltpu.VMEM)

    def b_spec():
        return pl.BlockSpec((C, 1, W), lambda i: ((n_blocks - 1) - i, 0, 0),
                            memory_space=pltpu.VMEM)

    def const(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda i, _nd=nd: (0,) * _nd,
                            memory_space=pltpu.VMEM)

    in_specs = [
        pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        const((B, W)),                      # h0
        const((B, W)),                      # d_h_last
        # a[s-1], the input to each block's first layer (clamped at the
        # stack's layer 0, where h0 is used instead)
        pl.BlockSpec((1, B, W),
                     lambda i: (jnp.maximum(((n_blocks - 1) - i) * C - 1,
                                            0), 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((C, B, W), lambda i: ((n_blocks - 1) - i, 0, 0),
                     memory_space=pltpu.VMEM),
        w_spec(),
    ]
    in_specs += [w_spec() for _ in range(n_slots)]

    out_shape = (
        [jax.ShapeDtypeStruct((L, W, W), jnp.float32)]
        + [jax.ShapeDtypeStruct((L, W, W), slot_dt)
           for _ in range(n_slots)]
        + [jax.ShapeDtypeStruct((L, 1, W), jnp.float32)]   # db stack
        + [jax.ShapeDtypeStruct((B, W), jnp.float32)]      # dh0
    )
    out_specs = (
        [w_spec()]
        + [w_spec() for _ in range(n_slots)]
        + [b_spec()]
        + [const((B, W))]
    )

    return pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=in_specs,
        out_shape=out_shape,
        out_specs=out_specs,
        scratch_shapes=[pltpu.VMEM((B, W), jnp.float32)],
        compiler_params=_compiler_params(),
        interpret=interpret,
    )


def build_streaming_step(net, loss_fn, optimizer, interpret=False):
    """Returns step_fn(params, opt_state, xb, yb) -> (new_params,
    new_opt_state, loss) — drop-in for Model._step_core's contract, traced
    under jit / lax.scan by the caller."""
    from tinynn_autograd_tpu.nn.layers import Dense

    stack_idx = _find_stack(net)
    stack = net.layers[stack_idx]
    L, W = stack.depth, int(stack.width)
    act_name = stack.activation
    slot_names = optimizer.slot_names
    n_slots = len(slot_names)
    n_layers = len(net.layers)
    prefix = list(enumerate(net.layers[:stack_idx]))
    suffix = [(stack_idx + 1 + j, l)
              for j, l in enumerate(net.layers[stack_idx + 1:])]

    def run_segment(layers, params, h, tensors):
        for li, layer in layers:
            if isinstance(layer, Dense):
                w = Tensor(params[li]["w"], requires_grad=True)
                b = Tensor(params[li]["b"], requires_grad=True)
                tensors[li] = {"w": w, "b": b}
                h = h @ w + b
            else:
                h = layer.forward(h)
        return h

    def step_fn(params, opt_state, xb, yb):
        B = xb.shape[0]
        fwd = _build_forward(L, B, W, act_name,
                             _pick_block_fwd(L, B, W), interpret)
        slot_bytes = jnp.dtype(optimizer.slot_dtype or jnp.float32).itemsize
        bwd = _build_backward(L, B, W, act_name, optimizer,
                              _pick_block_bwd(L, B, W, n_slots, slot_bytes),
                              interpret)

        t_new = opt_state["t"] + 1
        lr = optimizer._lr_at(t_new)

        # ---- prefix forward on the tape
        tensors = {}
        h0 = run_segment(prefix, params, Tensor(xb), tensors)

        # ---- body forward: stream weights, emit the activation stack
        acts = fwd(h0.data, params[stack_idx]["w"], params[stack_idx]["b"])

        # ---- suffix + loss on the tape (fresh leaf at the body output)
        h_last = Tensor(acts[L - 1], requires_grad=True)
        out = run_segment(suffix, params, h_last, tensors)
        loss_t = loss_fn.loss(out, Tensor(yb))
        loss_t.backward()

        # ---- body backward + in-kernel weight update (biases are updated
        # outside on the emitted db stack: 6 fewer DMA streams per block)
        slots = opt_state["slots"]
        slot_w = [slots[n][stack_idx]["w"] for n in slot_names]
        t_smem = t_new.astype(jnp.int32).reshape(1, 1)
        lr_smem = jnp.asarray(lr, jnp.float32).reshape(1, 1)
        # acts is passed twice: once as the [1,B,W] per-block-boundary
        # stream (a[s-1]) and once as the [C,B,W] block stream
        outs = bwd(t_smem, lr_smem, h0.data, h_last.grad, acts,
                   acts, params[stack_idx]["w"], *slot_w)
        new_w = outs[0]
        new_slot_w = outs[1:1 + n_slots]
        db_stack = outs[1 + n_slots]
        d_h0 = outs[2 + n_slots]

        # stacked-bias update: the [L,1,W] leaf through the same per-leaf
        # rule (elementwise, so one stacked call == L per-layer calls)
        sb = {n: slots[n][stack_idx]["b"] for n in slot_names}
        step_b, new_sb = optimizer.step_leaf(db_stack, lr, t_new, sb,
                                             salt=BIAS_SALT)
        if optimizer.weight_decay:
            step_b = step_b - optimizer.weight_decay * params[stack_idx]["b"]
        new_b = params[stack_idx]["b"] + step_b
        new_slot_b = [new_sb[n] for n in slot_names]

        # ---- prefix backward: seed the body's input cotangent
        if h0.requires_grad:
            h0.backward(d_h0)

        # ---- small leaves (prefix + suffix) through the normal optimizer
        small_params = [params[i] if i != stack_idx else {}
                        for i in range(n_layers)]
        small_grads = [
            {k: tensors[i][k].grad for k in tensors[i]}
            if i in tensors else {}
            for i in range(n_layers)
        ]
        small_slots = {
            n: [slots[n][i] if i != stack_idx else {}
                for i in range(n_layers)]
            for n in slot_names
        }
        steps, small_state = optimizer.update(
            small_grads, small_params,
            {"t": opt_state["t"], "slots": small_slots})

        new_params = []
        for i in range(n_layers):
            if i == stack_idx:
                new_params.append({"w": new_w, "b": new_b})
            elif steps[i]:
                new_params.append({k: params[i][k] + steps[i][k]
                                   for k in params[i]})
            else:
                new_params.append(dict(params[i]))
        new_slots = {
            n: [
                {"w": new_slot_w[k], "b": new_slot_b[k]}
                if i == stack_idx else small_state["slots"][n][i]
                for i in range(n_layers)
            ]
            for k, n in enumerate(slot_names)
        }
        return new_params, {"t": t_new, "slots": new_slots}, loss_t.data

    return step_fn
