from tinynn_autograd_tpu.models.mlp import build_deep_mlp, build_mnist_mlp
from tinynn_autograd_tpu.models.cnn import build_mnist_cnn

__all__ = ["build_mnist_mlp", "build_deep_mlp", "build_mnist_cnn"]
