"""Expert parallelism: MoE experts sharded across a mesh axis.

Each device holds E/n experts (the stacked [E, ...] leaves split on the
leading expert axis) and runs THEM on the full token stream; the one-hot
router mask zeroes tokens routed elsewhere and a single ``psum``
reassembles the selected outputs — numerically EXACT equality with
single-device MoE (the dense-select formulation has no capacity drops or
token shuffling to replicate). The gate is replicated and its gradient is
replicated by construction (it multiplies the post-psum output), so the
only cross-device traffic is one all-reduce of [N, D] per MoE layer each
direction.

This is the capacity-free, exactness-first flavor of EP: compute per
device scales 1/n with the expert count, while communication stays one
psum (a capacity-factor all_to_all dispatch is the lossy production
variant — a round-3 note). No jax.grad anywhere; the tape runs through
``psum_`` like every other collective.
"""

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

import tinynn_autograd_tpu.ops as ops
from tinynn_autograd_tpu.core.tensor import Tensor
from tinynn_autograd_tpu.nn.layers import MoE
from tinynn_autograd_tpu.parallel._common import (
    bind_traced_layer, rebind_concrete,
)
from tinynn_autograd_tpu.parallel.mesh import make_mesh

_EXPERT_LEAVES = ("w1", "b1", "w2", "b2")


class ExpertParallel:
    """Usage::

        ep = ExpertParallel(model, mesh=make_mesh(8, axis_name="expert"))
        loss = ep.train_step(x, y)     # full batch, replicated
    """

    def __init__(self, model, mesh=None, n_devices=None,
                 axis_name="expert"):
        self.model = model
        self.mesh = mesh if mesh is not None else make_mesh(
            n_devices, axis_name)
        self.axis_name = axis_name
        self.n_devices = int(self.mesh.devices.size)
        self._params = None
        self._opt_state = None
        self._step_fn = None

    @property
    def net(self):
        return self.model.net

    def _validate(self):
        has_moe = False
        for layer in self.net.layers:
            if hasattr(layer, "set_rng"):
                raise ValueError(
                    "ExpertParallel does not support stochastic layers; "
                    "got %s" % layer.name)
            if isinstance(layer, MoE):
                has_moe = True
                if layer.num_experts % self.n_devices:
                    raise ValueError(
                        "%d experts don't divide over %d devices"
                        % (layer.num_experts, self.n_devices))
        if not has_moe:
            raise ValueError("ExpertParallel needs at least one MoE layer")

    # ------------------------------------------------------------- forward

    def _ep_moe_forward(self, layer, params, h):
        """Local experts on all tokens, masked to their routed tokens,
        psum-reassembled. Identical numerics to MoE.forward."""
        axis = self.axis_name
        n = self.n_devices
        e_loc = layer.num_experts // n
        p = {k: Tensor(v, requires_grad=True) for k, v in params.items()}
        shape = h.shape
        flat = h.reshape((-1, layer.dim))
        probs = ops.softmax_(flat @ p["wg"], axis=-1)
        choice = jnp.argmax(probs.data, axis=-1)
        onehot = jnp.eye(layer.num_experts, dtype=jnp.float32)[choice]
        idx = jax.lax.axis_index(axis)
        local_mask = jax.lax.dynamic_slice_in_dim(
            onehot, idx * e_loc, e_loc, 1)          # [N, E/n]
        # Megatron "f" on the expert branch input: each device's backward
        # only produces its local experts' PARTIAL input cotangent
        flat_e = ops.replicate_grad_(flat, axis)
        out_e = layer.expert_outputs(flat_e, p["w1"], p["b1"],
                                     p["w2"], p["b2"])  # [E/n, N, D]
        sel_local = ops.sum_(out_e * local_mask.T[:, :, None], axis=0)
        sel = ops.psum_(sel_local, axis)
        g = ops.sum_(probs * onehot, axis=-1, keepdims=True)
        return (sel * g).reshape(shape), p

    def _forward(self, params, x):
        h = Tensor(x)
        tensors = []
        for li, layer in enumerate(self.net.layers):
            if isinstance(layer, MoE):
                h, p = self._ep_moe_forward(layer, params[li], h)
                tensors.append(p)
            elif params[li]:
                tensors.append(bind_traced_layer(layer, params[li]))
                h = layer.forward(h)
            else:
                h = layer.forward(h)
                tensors.append({})
        return h, tensors

    # --------------------------------------------------------------- build

    def _build(self):
        loss_fn = self.model.loss
        optimizer = self.model.optimizer
        specs = self._specs

        def local_step(params, opt_state, x, y):
            pred, tensors = self._forward(params, x)
            loss_t = loss_fn.loss(pred, Tensor(y))
            loss_t.backward()
            grads = [
                {k: t.grad for k, t in layer.items()} for layer in tensors
            ]
            # expert-shard grads are exact locals; everything replicated
            # (gate, non-MoE layers) has replicated cotangents already
            steps, new_opt = optimizer.update(grads, params, opt_state)
            new_params = jax.tree.map(lambda pp, s: pp + s, params, steps)
            return new_params, new_opt, loss_t.data

        opt_spec = {"t": P(),
                    "slots": {n: specs for n in optimizer.slot_names}}
        sharded = jax.shard_map(
            local_step, mesh=self.mesh,
            in_specs=(specs, opt_spec, P(), P()),
            out_specs=(specs, opt_spec, P()),
            check_vma=False,
        )
        return jax.jit(sharded, donate_argnums=(0, 1))

    # ----------------------------------------------------------- train API

    def train_step(self, x, y):
        """One expert-parallel fused step on a replicated batch; returns
        the loss (device scalar)."""
        x = jnp.asarray(x.data if isinstance(x, Tensor) else x)
        y = jnp.asarray(y.data if isinstance(y, Tensor) else y)
        if not self.net.is_init:
            self.net.init(x.shape)
        self._validate()
        if self._params is None:
            tree, specs = [], []
            for layer in self.net.layers:
                lt, ls = {}, {}
                for name, ts in layer.params.items():
                    if ts is None:
                        continue
                    spec = (P(self.axis_name)
                            if isinstance(layer, MoE)
                            and name in _EXPERT_LEAVES else P())
                    lt[name] = jax.device_put(
                        ts.data, NamedSharding(self.mesh, spec))
                    ls[name] = spec
                tree.append(lt)
                specs.append(ls)
            self._params, self._specs = tree, specs
        if self._opt_state is None:
            self._opt_state = self.model.optimizer.init_state(self._params)
        if self._step_fn is None:
            self.net.set_phase("TRAIN")
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
