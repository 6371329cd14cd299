"""Expert parallelism: MoE experts sharded across a mesh axis.

Two dispatch modes (``dispatch=`` ctor arg):

``"dense"`` (exactness-first): each device holds E/n experts and runs THEM
on the full (replicated) token stream; the one-hot router mask zeroes
tokens routed elsewhere and a single ``psum`` reassembles the selected
outputs — numerically EXACT equality with single-device MoE (no capacity
drops or token shuffling to replicate). Compute per device scales 1/n
with the expert count but every expert still touches every token, so the
aggregate FLOP cost stays E x the routed cost.

``"a2a"`` (the production Switch-Transformer flavor): tokens are BATCH-
sharded over the same mesh axis as the experts. Each device routes its
local tokens, packs them into per-(destination, local-expert) capacity
slots (expert capacity = ceil(capacity_factor * local_tokens / E); tokens
over capacity are DROPPED and contribute zero output and zero gradient —
the classic lossy trade), and one ``all_to_all`` ships every token to its
expert's device. Experts run on exactly the tokens routed to them (aggregate
FLOPs ~ capacity_factor/E of dense-select), a second all_to_all returns the
outputs, and a gather combines them scaled by the gate probability.
Dispatch/combine are ``getitem_`` gathers whose scatter-add VJPs are the
exact adjoints, and ``all_to_all_``'s VJP is the inverse permutation, so
the ordinary tape generates the whole backward dispatch. A Switch-style
load-balancing auxiliary loss (E * sum_e f_e * P_e, with f_e the dispatch
fraction and P_e the mean gate probability, both psum'd global) is added
with weight ``aux_loss_weight`` to keep the router from collapsing.

No jax.grad anywhere; the tape runs through ``psum_``/``all_to_all_``
like every other collective.
"""

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

import tinynn_autograd_tpu.ops as ops
from tinynn_autograd_tpu.core.tensor import Tensor
from tinynn_autograd_tpu.nn.layers import MoE
from tinynn_autograd_tpu.parallel._common import (
    adopt_pending_opt, bind_traced_layer, rebind_concrete, shard_opt_state,
    wrapper_load, wrapper_save,
)
from tinynn_autograd_tpu.parallel.mesh import make_mesh

_EXPERT_LEAVES = ("w1", "b1", "w2", "b2")


class ExpertParallel:
    """Usage::

        ep = ExpertParallel(model, mesh=make_mesh(8, axis_name="expert"))
        loss = ep.train_step(x, y)     # full batch, replicated
    """

    def __init__(self, model, mesh=None, n_devices=None,
                 axis_name="expert", dispatch="dense", capacity_factor=1.25,
                 aux_loss_weight=0.01):
        """``dispatch``: "dense" (exact, replicated tokens) or "a2a"
        (capacity-factor all_to_all token dispatch, batch-sharded tokens —
        see module docstring). ``capacity_factor``/``aux_loss_weight``
        apply to "a2a" only."""
        self.model = model
        self.mesh = mesh if mesh is not None else make_mesh(
            n_devices, axis_name)
        self.axis_name = axis_name
        self.n_devices = int(self.mesh.devices.size)
        if dispatch not in ("dense", "a2a"):
            raise ValueError("dispatch must be 'dense' or 'a2a', got %r"
                             % (dispatch,))
        self.dispatch = dispatch
        self.capacity_factor = capacity_factor
        self.aux_loss_weight = aux_loss_weight
        self.last_stats = None   # {"dropped": int, "load": [E]} after a2a step
        self._params = None
        self._opt_state = None
        self._step_fn = None

    @property
    def net(self):
        return self.model.net

    def _validate(self):
        if self.dispatch == "dense" and not getattr(self, "_warned", False):
            import warnings

            warnings.warn(
                "ExpertParallel dispatch='dense' runs every expert on every "
                "token (E x the routed FLOPs; exactness-first mode). For "
                "production scaling use dispatch='a2a' (capacity-factor "
                "all_to_all, ~capacity_factor/E of the dense FLOPs).",
                stacklevel=3)
            self._warned = True
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

    def _ep_moe_forward_a2a(self, layer, params, h):
        """Capacity-factor all_to_all token dispatch (see module docstring):
        tokens enter batch-sharded [Nl, D]; each is packed into a
        (destination device, local expert, capacity) slot, shipped by one
        all_to_all, processed by exactly its expert, shipped back, and
        combined scaled by the gate probability. Over-capacity tokens are
        dropped (zero output/gradient). Dispatch/combine are getitem_
        gathers — their scatter-add VJPs are the exact adjoints.

        Returns (out, param tensors, aux loss Tensor, stats dict)."""
        axis = self.axis_name
        n = self.n_devices
        E = layer.num_experts
        e_loc = E // n
        p = {k: Tensor(v, requires_grad=True) for k, v in params.items()}
        shape = h.shape
        flat = h.reshape((-1, layer.dim))                 # [Nl, D]
        nl = int(flat.shape[0])
        cap = max(1, int(np.ceil(self.capacity_factor * nl / E)))
        n_slots = n * e_loc * cap                         # E * cap

        probs = ops.softmax_(flat @ p["wg"], axis=-1)     # [Nl, E]
        choice = jnp.argmax(probs.data, axis=-1)          # [Nl]
        onehot = jnp.eye(E, dtype=jnp.float32)[choice]    # [Nl, E] raw

        # rank of each token among local tokens routed to the same expert;
        # rank >= cap means the token is dropped (Switch capacity rule)
        ranks = (jnp.cumsum(onehot, axis=0) - 1.0) * onehot
        pos = ranks.sum(-1).astype(jnp.int32)
        kept = pos < cap
        dest = choice // e_loc
        slot = dest * (e_loc * cap) + (choice % e_loc) * cap + pos

        # slot -> token index (empty slots read token 0, masked to zero)
        oob = jnp.where(kept, slot, n_slots)              # dropped -> OOB
        slot_tok = jnp.zeros((n_slots,), jnp.int32).at[oob].set(
            jnp.arange(nl, dtype=jnp.int32), mode="drop")
        slot_filled = jnp.zeros((n_slots,), jnp.float32).at[oob].set(
            1.0, mode="drop")

        send = flat[slot_tok] * slot_filled[:, None]      # [S, D] on tape
        send = send.reshape((n, e_loc, cap, layer.dim))
        # out[src] on device d = in[d] on device src: tokens land on their
        # expert's device, indexed by source
        recv = ops.all_to_all_(send, axis, split_axis=0, concat_axis=0)
        xin = recv.transpose((1, 0, 2, 3)).reshape(
            (e_loc, n * cap, layer.dim))
        hid = ops.relu_(xin @ p["w1"] + p["b1"])          # local expert shard
        y = hid @ p["w2"] + p["b2"]
        y = y.reshape((e_loc, n, cap, layer.dim)).transpose((1, 0, 2, 3))
        y = ops.all_to_all_(y, axis, split_axis=0, concat_axis=0)
        y_flat = y.reshape((n_slots, layer.dim))

        gate = ops.sum_(probs * onehot, axis=-1, keepdims=True)  # [Nl, 1]
        keep_f = kept.astype(jnp.float32)[:, None]
        out = y_flat[jnp.where(kept, slot, 0)] * keep_f * gate
        out = out.reshape(shape)

        # Switch load-balancing aux loss over GLOBAL tokens:
        # E * sum_e f_e * P_e (f = dispatch fraction, P = mean gate prob)
        ng = float(n * nl)
        f_glob = jax.lax.psum(onehot.sum(0), axis) / ng           # raw [E]
        p_glob = ops.psum_(ops.sum_(probs, axis=0), axis) * (1.0 / ng)
        aux = ops.sum_(p_glob * f_glob) * float(E)
        stats = {
            "dropped": jax.lax.psum((~kept).sum().astype(jnp.int32), axis),
            "load": f_glob,
        }
        return out, p, aux, stats

    def _forward(self, params, x):
        h = Tensor(x)
        tensors = []
        aux_losses = []
        stats = None
        for li, layer in enumerate(self.net.layers):
            if isinstance(layer, MoE):
                if self.dispatch == "a2a":
                    h, p, aux, lstats = self._ep_moe_forward_a2a(
                        layer, params[li], h)
                    if stats is None:
                        stats = {"dropped": lstats["dropped"],
                                 "load": lstats["load"],
                                 "dropped_per_layer": [lstats["dropped"]]}
                    else:
                        # accumulate across MoE layers: total drop count,
                        # per-layer breakdown; "load" reports the LAST MoE
                        # layer's dispatch fractions (layers can differ in E)
                        stats = {
                            "dropped": stats["dropped"] + lstats["dropped"],
                            "load": lstats["load"],
                            "dropped_per_layer": (stats["dropped_per_layer"]
                                                  + [lstats["dropped"]]),
                        }
                    aux_losses.append(aux)
                else:
                    h, p = self._ep_moe_forward(layer, params[li], h)
                tensors.append(p)
            elif params[li]:
                tensors.append(bind_traced_layer(layer, params[li]))
                h = layer.forward(h)
            else:
                h = layer.forward(h)
                tensors.append({})
        return h, tensors, aux_losses, stats

    # --------------------------------------------------------------- build

    def _build(self):
        loss_fn = self.model.loss
        optimizer = self.model.optimizer
        specs = self._specs
        axis = self.axis_name
        a2a = self.dispatch == "a2a"
        nd = self.n_devices
        expert_idx = {li for li, l in enumerate(self.net.layers)
                      if isinstance(l, MoE)}

        def local_step(params, opt_state, x, y):
            pred, tensors, aux_losses, stats = self._forward(params, x)
            ce = loss_fn.loss(pred, Tensor(y))
            if a2a:
                # Seed backward from J_s = local_CE/n + a*aux. The grads
                # are assembled as psum-of-local-grads (replicated leaves)
                # / a2a-accumulated cotangents (expert leaves), so what
                # matters is the per-path cotangent each device's tape
                # contributes: CE needs 1/n (psum over n devices then
                # reassembles d(global-mean CE)), but aux reaches each
                # device's tape ONLY through its local probs (psum_'s VJP
                # is identity-per-shard), so its cotangent must be the
                # full a — dividing it by n would shrink the balancing
                # pressure with mesh size.
                obj = ce * (1.0 / nd)
                for aux in aux_losses:
                    obj = obj + aux * self.aux_loss_weight
                obj.backward()
            else:
                ce.backward()
            grads = [
                {k: t.grad for k, t in layer.items()} for layer in tensors
            ]
            if a2a:
                for li, lt in enumerate(grads):
                    for k in lt:
                        if not (li in expert_idx and k in _EXPERT_LEAVES):
                            lt[k] = jax.lax.psum(lt[k], axis)
            # dense mode: expert-shard grads are exact locals; everything
            # replicated (gate, non-MoE layers) has replicated cotangents
            steps, new_opt = optimizer.update(grads, params, opt_state)
            new_params = jax.tree.map(lambda pp, s: pp + s, params, steps)
            if a2a:
                loss_out = jax.lax.psum(ce.data, axis) / nd  # global mean CE
                return new_params, new_opt, loss_out, stats
            return new_params, new_opt, ce.data

        opt_spec = {"t": P(),
                    "slots": {n: specs for n in optimizer.slot_names}}
        batch_spec = P(axis) if a2a else P()
        out_specs = (specs, opt_spec, P())
        if a2a:
            n_moe = len(expert_idx)
            out_specs = out_specs + ({"dropped": P(), "load": P(),
                                      "dropped_per_layer": [P()] * n_moe},)
        sharded = jax.shard_map(
            local_step, mesh=self.mesh,
            in_specs=(specs, opt_spec, batch_spec, batch_spec),
            out_specs=out_specs,
            check_vma=False,
        )
        return jax.jit(sharded, donate_argnums=(0, 1))

    # ----------------------------------------------------------- train API

    def train_step(self, x, y):
        """One expert-parallel fused step; returns the loss (device
        scalar). "dense" runs on a replicated batch; "a2a" shards the
        batch over the expert axis (size must divide by the mesh) and
        additionally records ``self.last_stats`` = {"dropped": total
        over-capacity tokens this step summed over ALL MoE layers,
        "load": the LAST MoE layer's global per-expert dispatch fractions,
        "dropped_per_layer": per-MoE-layer drop counts}."""
        x = jnp.asarray(x.data if isinstance(x, Tensor) else x)
        y = jnp.asarray(y.data if isinstance(y, Tensor) else y)
        if self.dispatch == "a2a" and x.shape[0] % self.n_devices:
            raise ValueError(
                "a2a dispatch needs the batch (%d) divisible by the mesh "
                "(%d)" % (x.shape[0], self.n_devices))
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
            self._opt_state = adopt_pending_opt(
                self, lambda host: shard_opt_state(
                    self.mesh, self._specs, host))
        if self._step_fn is None:
            self.model.set_phase("TRAIN")
            self._step_fn = self._build()

        bspec = P(self.axis_name) if self.dispatch == "a2a" else P()
        bsh = NamedSharding(self.mesh, bspec)
        x = jax.device_put(x, bsh)
        y = jax.device_put(y, bsh)
        if self.dispatch == "a2a":
            (self._params, self._opt_state, loss,
             self.last_stats) = self._step_fn(
                self._params, self._opt_state, x, y)
        else:
            self._params, self._opt_state, loss = self._step_fn(
                self._params, self._opt_state, x, y)
        rebind_concrete(self.net, self._params)
        return loss

    def gather_params(self):
        return [jax.tree.map(np.asarray, layer) for layer in self._params]

    # ----------------------------------------------------------- checkpoint

    def save(self, path):
        """Checkpoint in the plain Model format (expert stacks gathered to
        full [E, ...] host arrays) — loadable by ExpertParallel OR Model."""
        wrapper_save(self, path)

    def load(self, path):
        """Restore a Model-format checkpoint; expert leaves re-shard over
        the mesh at the next train_step."""
        wrapper_load(self, path)
