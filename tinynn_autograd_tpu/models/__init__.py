from tinynn_autograd_tpu.models.mlp import build_deep_mlp, build_mnist_mlp
from tinynn_autograd_tpu.models.cnn import build_mnist_cnn
from tinynn_autograd_tpu.models.generate import generate, generate_beam
from tinynn_autograd_tpu.models.rnn import build_rnn_classifier
from tinynn_autograd_tpu.models.transformer import (
    build_tiny_llama, build_tiny_lm, build_tiny_transformer,
    build_tiny_vit,
)

__all__ = ["build_mnist_mlp", "build_deep_mlp", "build_mnist_cnn",
           "build_tiny_transformer", "build_tiny_lm", "build_tiny_llama",
           "build_tiny_vit", "build_rnn_classifier", "generate",
           "generate_beam"]
