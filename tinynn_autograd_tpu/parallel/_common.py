"""Shared plumbing for the model-parallel wrappers (TP/CP/EP).

These wrappers bind TRACED param Tensors into the live layers while
shard_map traces the step; after the call the layers must be re-bound to
the concrete (global, sharded) arrays or tracers leak into the net and
the next ``model.predict``/``model.save`` explodes (the bug DataParallel
always guarded against)."""

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
