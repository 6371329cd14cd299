"""Shared plumbing for the model-parallel wrappers (TP/CP/EP).

These wrappers bind TRACED param Tensors into the live layers while
shard_map traces the step; after the call the layers must be re-bound to
the concrete (global, sharded) arrays or tracers leak into the net and
the next ``model.predict``/``model.save`` explodes (the bug DataParallel
always guarded against).

Checkpointing: every wrapper saves in the plain ``Model`` format
(reference save/load contract: /root/reference/core/model.py:18-35) with
FULL host-layout arrays — ``np.asarray`` on a sharded ``jax.Array``
gathers the shards transparently — so a wrapper checkpoint loads into a
fresh wrapper OR a plain single-device Model interchangeably. On load the
full arrays are re-sharded lazily at the next ``train_step`` (the specs
only exist once the wrapper has planned its layout)."""

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from tinynn_autograd_tpu.core.tensor import Tensor


def bind_traced_layer(layer, layer_params):
    """Install traced replicated params into a layer for the duration of a
    traced forward; returns the bound Tensors for grad collection."""
    bound = {}
    for name, arr in layer_params.items():
        t = Tensor(arr, requires_grad=True)
        layer.params[name] = t
        bound[name] = t
    return bound


def rebind_concrete(net, params_tree):
    """Restore the layers' live params to the concrete device arrays after
    a traced step (global shapes, sharding preserved)."""
    for layer, tree in zip(net.layers, params_tree):
        for k, arr in tree.items():
            layer.params[k] = Tensor(arr, requires_grad=True)


def wrapper_save(wrapper, path):
    """Save a layer-congruent wrapper (TP/CP/EP) as a plain Model
    checkpoint: live sharded params/opt-state gather to full host arrays
    inside Model.save's np.asarray pass."""
    model = wrapper.model
    if wrapper._params is not None:
        rebind_concrete(model.net, wrapper._params)
        model._opt_state = wrapper._opt_state
    model.save(path)


def wrapper_load(wrapper, path):
    """Load a Model-format checkpoint into a wrapper: full params land in
    the net's layers (wrapper re-shards them at the next train_step);
    optimizer state is stashed host-side until the layout specs exist."""
    model = wrapper.model
    model.load(path)
    wrapper._params = None
    wrapper._opt_state = None
    wrapper._step_fn = None
    wrapper._pending_opt = model._opt_state   # full layout; None if absent


def adopt_pending_opt(wrapper, shard_fn):
    """Resolve the wrapper's optimizer state after _shard_params: re-shard
    a checkpoint-loaded state via ``shard_fn`` if one is pending, else
    init fresh."""
    pending = getattr(wrapper, "_pending_opt", None)
    if pending is not None:
        wrapper._pending_opt = None
        return shard_fn(pending)
    return wrapper.model.optimizer.init_state(wrapper._params)


def shard_opt_state(mesh, specs, host_state):
    """Re-shard a full-layout optimizer state: slot leaves follow the
    per-layer param specs (list-of-dicts), the step counter replicates."""
    slots = {
        name: [
            {k: jax.device_put(jnp.asarray(v),
                               NamedSharding(mesh, specs[li][k]))
             for k, v in layer.items()}
            for li, layer in enumerate(tree)
        ]
        for name, tree in host_state["slots"].items()
    }
    t = jax.device_put(jnp.asarray(host_state["t"]), NamedSharding(mesh, P()))
    return {"t": t, "slots": slots}
