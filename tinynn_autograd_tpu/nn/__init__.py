from tinynn_autograd_tpu.nn.net import Net
from tinynn_autograd_tpu.nn.model import Model
from tinynn_autograd_tpu.nn import layers, losses, optimizer, initializer, evaluator, scheduler

__all__ = [
    "Net", "Model", "layers", "losses", "optimizer", "initializer",
    "evaluator", "scheduler",
]
