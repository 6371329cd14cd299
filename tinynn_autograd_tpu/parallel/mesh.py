"""Device mesh helpers.

The reference has no parallelism of any kind (SURVEY.md §2.2: no collective
library, single process). The TPU-native communication backend is JAX's
collectives over ICI: build a ``jax.sharding.Mesh``, annotate shardings, and
let XLA route psum/all-gather over the interconnect (same API spans DCN
across slices).
"""

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec


def make_mesh(n_devices=None, axis_name="data", devices=None):
    """1-D mesh over the first ``n_devices`` devices (default: all)."""
    if devices is None:
        devices = jax.devices()
    n = n_devices if n_devices is not None else len(devices)
    if n > len(devices):
        raise ValueError(
            "Requested %d devices, only %d available" % (n, len(devices)))
    return Mesh(np.array(devices[:n]), (axis_name,))


def make_mesh_2d(shape, axis_names=("data", "model"), devices=None):
    """2-D mesh, e.g. shape=(2, 4) for 2-way data x 4-way model parallelism.
    Lay the fastest-communicating axis innermost so its collectives ride
    adjacent ICI links."""
    if devices is None:
        devices = jax.devices()
    n = shape[0] * shape[1]
    if n > len(devices):
        raise ValueError(
            "Requested %d devices, only %d available" % (n, len(devices)))
    return Mesh(np.array(devices[:n]).reshape(shape), tuple(axis_names))


def batch_sharding(mesh, axis_name="data"):
    """NamedSharding that splits the leading (batch) dim over the mesh."""
    return NamedSharding(mesh, PartitionSpec(axis_name))


def replicated_sharding(mesh):
    return NamedSharding(mesh, PartitionSpec())
