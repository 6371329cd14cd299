"""tinynn_autograd_tpu: a TPU-native tape-based autodiff framework.

A from-scratch rebuild of the capabilities of borgwang/tinynn-autograd
(reference mounted at /root/reference) designed for TPU hardware: tensors are
HBM-resident jax.Arrays, reverse-mode autodiff is our own tape (not jax.grad),
hot kernels run on the MXU via Pallas, whole train steps fuse into single XLA
programs, and scaling is mesh data-parallelism with psum over ICI.
"""

from tinynn_autograd_tpu.core.tensor import Tensor, as_tensor
from tinynn_autograd_tpu import ops
from tinynn_autograd_tpu.nn import Model, Net
from tinynn_autograd_tpu.nn import layers, losses, optimizer, initializer, evaluator, scheduler
from tinynn_autograd_tpu import utils

__version__ = "0.1.0"

__all__ = [
    "Tensor", "as_tensor", "ops", "Model", "Net", "layers", "losses",
    "optimizer", "initializer", "evaluator", "scheduler", "utils",
    "__version__",
]
