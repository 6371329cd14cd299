"""Context parallelism: RING ATTENTION over a mesh axis.

Shards the SEQUENCE across devices (params replicated): each device holds
its queries and its K/V chunk for the local T/n rows, and the K/V chunks
rotate around the ring via ``ppermute`` — n-1 hops per attention, the
classic ring-attention communication topology over ICI. Because softmax is
invariant to the COLUMN order of its row, each device accumulates score
blocks in ring-arrival order (no reindexing collective needed) and applies
one exact softmax over the concatenated row — numerics identical to full
attention, with the score matrix memory cut to T^2/n per device (each
device materializes only its own T/n query rows).

NO separate backward schedule: ``ppermute_``'s hand VJP routes each K/V
chunk's cotangent backward around the same ring, and the rest is the
ordinary tape. Parameters are replicated; their per-device gradients are
partial (computed from 1/n of the sequence rows) and get ONE psum before
the optimizer — the same pattern as data parallelism, but sharding the
sequence instead of the batch.

Causal masking is supported in both modes: the ring masks each score
block by GLOBAL positions (the resident K chunk at ring step s belongs to
device (idx-s) mod n), and Ulysses applies the ordinary full-length mask
(its all_to_all output is in global order). Embedding/positional/head
layers run replicated outside the ring region.
"""

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

import tinynn_autograd_tpu.ops as ops
from tinynn_autograd_tpu.core.tensor import Tensor
from tinynn_autograd_tpu.nn.layers import TransformerBlock
from tinynn_autograd_tpu.parallel._common import (
    adopt_pending_opt, bind_traced_layer, rebind_concrete, shard_opt_state,
    wrapper_load, wrapper_save,
)
from tinynn_autograd_tpu.parallel.mesh import make_mesh


class ContextParallel:
    """Usage::

        cp = ContextParallel(model, mesh=make_mesh(8, axis_name="ctx"))
        loss = cp.train_step(x, y)     # full batch, replicated
    """

    def __init__(self, model, mesh=None, n_devices=None, axis_name="ctx",
                 mode="ring"):
        """``mode``: "ring" rotates K/V chunks over ppermute (n-1 hops,
        T^2/n score memory per device); "ulysses" re-shards seq<->heads
        with two all_to_all pairs so attention runs on H/n full-sequence
        heads per device (head count must divide by the mesh)."""
        self.model = model
        self.mesh = mesh if mesh is not None else make_mesh(
            n_devices, axis_name)
        self.axis_name = axis_name
        self.n_devices = int(self.mesh.devices.size)
        if mode not in ("ring", "ulysses"):
            raise ValueError("mode must be 'ring' or 'ulysses', got %r"
                             % (mode,))
        self.mode = mode
        self._params = None
        self._opt_state = None
        self._step_fn = None

    @property
    def net(self):
        return self.model.net

    def _validate(self):
        for layer in self.net.layers:
            if hasattr(layer, "set_rng"):
                raise ValueError(
                    "ContextParallel does not support stochastic layers; "
                    "got %s" % layer.name)
            if (self.mode == "ulysses"
                    and isinstance(layer, TransformerBlock)
                    and layer.num_heads % self.n_devices):
                raise ValueError(
                    "ulysses needs heads (%d) divisible by the mesh (%d)"
                    % (layer.num_heads, self.n_devices))

    # ------------------------------------------------------------- forward

    def _ring_block_forward(self, layer, params, h):
        """One TransformerBlock on the sequence shard [B, T/n, D] with K/V
        rotating around the ring. Replicated params as traced leaves."""
        axis = self.axis_name
        n = self.n_devices
        ring = [(i, (i + 1) % n) for i in range(n)]
        p = {k: Tensor(v, requires_grad=True) for k, v in params.items()}
        b, tl, d = h.shape
        nh, hd = layer.num_heads, layer.head_dim

        def split_heads(x):  # [B,Tl,D] -> [B,H,Tl,hd]
            return x.reshape((b, tl, nh, hd)).transpose((0, 2, 1, 3))

        xn = ops.layer_norm_(h, p["g1"], p["be1"], eps=layer.eps)
        q = split_heads(xn @ p["wq"])
        kj = split_heads(xn @ p["wk"])
        vj = split_heads(xn @ p["wv"])

        # ring: score block against the resident K chunk, then pass K/V on.
        # Softmax is column-order invariant, so ring-arrival order is fine
        # as long as V blocks align with their score blocks (they do).
        idx = jax.lax.axis_index(axis)
        row_pos = idx * tl + jax.lax.broadcasted_iota(
            jnp.int32, (tl, tl), 0)
        col_iota = jax.lax.broadcasted_iota(jnp.int32, (tl, tl), 1)
        score_blocks = []
        v_blocks = []
        for s in range(n):
            block = q @ kj.transpose((0, 1, 3, 2))
            if layer.causal:
                # the resident K chunk at ring step s belongs to device
                # (idx - s) mod n: mask by GLOBAL positions
                owner = (idx - s) % n
                col_pos = owner * tl + col_iota
                block = block + jnp.where(col_pos <= row_pos, 0.0, -1e9)
            score_blocks.append(block)
            v_blocks.append(vj)
            if s < n - 1:
                kj = ops.ppermute_(kj, axis, ring)
                vj = ops.ppermute_(vj, axis, ring)
        scores = ops.concat(score_blocks, axis=-1) * (1.0 / np.sqrt(hd))
        attn = ops.softmax_(scores, axis=-1)   # [B,H,Tl,n*Tl]
        ctx = None
        for s in range(n):
            piece = attn[:, :, :, s * tl:(s + 1) * tl] @ v_blocks[s]
            ctx = piece if ctx is None else ctx + piece
        ctx = ctx.transpose((0, 2, 1, 3)).reshape((b, tl, d))
        x2 = h + ctx @ p["wo"]

        yn = ops.layer_norm_(x2, p["g2"], p["be2"], eps=layer.eps)
        y = ops.gelu_(yn @ p["w1"] + p["b1"]) @ p["w2"] + p["b2"]
        return x2 + y, p

    def _ulysses_block_forward(self, layer, params, h):
        """Ulysses attention on the sequence shard [B, T/n, D]: two
        all_to_all pairs re-shard q/k/v from sequence- to HEAD-sharding
        (each device attends over the FULL sequence for its H/n heads) and
        the context back. Replicated params as traced leaves; their
        (seq/head-local, hence partial) grads are psum'd by local_step."""
        axis = self.axis_name
        n = self.n_devices
        p = {k: Tensor(v, requires_grad=True) for k, v in params.items()}
        b, tl, d = h.shape
        nh, hd = layer.num_heads, layer.head_dim

        def split_heads(x):  # [B,Tl,D] -> [B,H,Tl,hd]
            return x.reshape((b, tl, nh, hd)).transpose((0, 2, 1, 3))

        def to_head_sharded(x):  # [B,H,Tl,hd] -> [B,H/n,T,hd]
            return ops.all_to_all_(x, axis, split_axis=1, concat_axis=2)

        xn = ops.layer_norm_(h, p["g1"], p["be1"], eps=layer.eps)
        q = to_head_sharded(split_heads(xn @ p["wq"]))
        k = to_head_sharded(split_heads(xn @ p["wk"]))
        v = to_head_sharded(split_heads(xn @ p["wv"]))
        scores = (q @ k.transpose((0, 1, 3, 2))) * (1.0 / np.sqrt(hd))
        # after the a2a the sequence axis is in GLOBAL order, so the
        # ordinary full-length causal mask applies directly
        mask = layer._mask(tl * n)
        if mask is not None:
            scores = scores + mask
        attn = ops.softmax_(scores, axis=-1)
        ctx = attn @ v                                   # [B,H/n,T,hd]
        ctx = ops.all_to_all_(ctx, axis, split_axis=2, concat_axis=1)
        ctx = ctx.transpose((0, 2, 1, 3)).reshape((b, tl, d))
        x2 = h + ctx @ p["wo"]

        yn = ops.layer_norm_(x2, p["g2"], p["be2"], eps=layer.eps)
        y = ops.gelu_(yn @ p["w1"] + p["b1"]) @ p["w2"] + p["b2"]
        return x2 + y, p

    def _forward(self, params, x):
        axis = self.axis_name
        h = Tensor(x)
        tensors = []
        seq_sharded = False
        for li, layer in enumerate(self.net.layers):
            if isinstance(layer, TransformerBlock):
                if not seq_sharded:
                    if h.shape[1] % self.n_devices:
                        raise ValueError(
                            "sequence length %d doesn't divide over %d "
                            "devices" % (h.shape[1], self.n_devices))
                    h = ops.split_axis_(h, axis, self.n_devices, axis=1)
                    seq_sharded = True
                if self.mode == "ulysses":
                    h, p = self._ulysses_block_forward(layer, params[li], h)
                else:
                    h, p = self._ring_block_forward(layer, params[li], h)
                tensors.append(p)
                continue
            if seq_sharded:
                h = ops.gather_axis_(h, axis, self.n_devices, axis=1)
                seq_sharded = False
            if params[li]:
                tensors.append(bind_traced_layer(layer, params[li]))
                h = layer.forward(h)
            else:
                h = layer.forward(h)
                tensors.append({})
        if seq_sharded:
            h = ops.gather_axis_(h, axis, self.n_devices, axis=1)
        return h, tensors

    # --------------------------------------------------------------- build

    def _build(self):
        loss_fn = self.model.loss
        optimizer = self.model.optimizer
        axis = self.axis_name
        block_idx = {li for li, l in enumerate(self.net.layers)
                     if isinstance(l, TransformerBlock)}

        def local_step(params, opt_state, x, y):
            pred, tensors = self._forward(params, x)
            loss_t = loss_fn.loss(pred, Tensor(y))
            loss_t.backward()
            grads = [
                {k: t.grad for k, t in layer.items()} for layer in tensors
            ]
            # ring-region params are replicated but each device only saw
            # its sequence rows: one all-reduce makes the grads total AND
            # identical, keeping the replicated updates in sync
            for li in block_idx:
                grads[li] = {k: jax.lax.psum(g, axis)
                             for k, g in grads[li].items()}
            steps, new_opt = optimizer.update(grads, params, opt_state)
            new_params = jax.tree.map(lambda pp, s: pp + s, params, steps)
            return new_params, new_opt, loss_t.data

        rep = [{k: P() for k in layer} for layer in self._params]
        opt_spec = {"t": P(),
                    "slots": {n: rep for n in optimizer.slot_names}}
        sharded = jax.shard_map(
            local_step, mesh=self.mesh,
            in_specs=(rep, opt_spec, P(), P()),
            out_specs=(rep, opt_spec, P()),
            check_vma=False,
        )
        return jax.jit(sharded, donate_argnums=(0, 1))

    # ----------------------------------------------------------- train API

    def train_step(self, x, y):
        """One ring-attention fused step on a replicated batch; returns the
        loss (device scalar)."""
        x = jnp.asarray(x.data if isinstance(x, Tensor) else x)
        y = jnp.asarray(y.data if isinstance(y, Tensor) else y)
        if not self.net.is_init:
            self.net.init(x.shape)
        self._validate()
        if self._params is None:
            rep = NamedSharding(self.mesh, P())
            self._params = [
                {k: jax.device_put(v.data, rep)
                 for k, v in layer.params.items() if v is not None}
                for layer in self.net.layers
            ]
            self._specs = [{k: P() for k in layer} for layer in self._params]
        if self._opt_state is None:
            self._opt_state = adopt_pending_opt(
                self, lambda host: shard_opt_state(
                    self.mesh, self._specs, host))
        if self._step_fn is None:
            self.model.set_phase("TRAIN")
            self._step_fn = self._build()

        rep = NamedSharding(self.mesh, P())
        x = jax.device_put(x, rep)
        y = jax.device_put(y, rep)
        self._params, self._opt_state, loss = self._step_fn(
            self._params, self._opt_state, x, y)
        rebind_concrete(self.net, self._params)
        return loss

    def gather_params(self):
        return [jax.tree.map(np.asarray, layer) for layer in self._params]

    # ----------------------------------------------------------- checkpoint

    def save(self, path):
        """Checkpoint in the plain Model format — loadable by
        ContextParallel OR a single-device Model."""
        wrapper_save(self, path)

    def load(self, path):
        """Restore a Model-format checkpoint; the optimizer state
        re-replicates over the mesh at the next train_step."""
        wrapper_load(self, path)
