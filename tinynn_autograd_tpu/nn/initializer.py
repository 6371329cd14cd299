"""Parameter initializers (reference surface: core/initializer.py).

Same class zoo and math as the reference — Normal / TruncatedNormal /
Uniform / Constant / Zeros / Xavier{Uniform,Normal} / He{Uniform,Normal}
with conv-aware ``get_fans`` — but drawn on-device with jax's counter-based
PRNG (fresh subkey per draw from the global stream, see utils/seeder), so
initialization is reproducible under ``random_seed`` and never leaves HBM.

Divergence: TruncatedNormalInit truncates at mean ± 2*std for ANY std (the
reference passes ``±2*std`` as *standardized* bounds to scipy's truncnorm,
reference: core/initializer.py:37, which double-scales for std != 1; for
std == 1 the two agree).
"""

import jax
import jax.numpy as jnp
import numpy as np

from tinynn_autograd_tpu.core.tensor import Tensor
from tinynn_autograd_tpu.utils.seeder import next_key


def get_fans(shape):
    """fan_in/fan_out; 2-D dense [in, out] or 4-D conv [out, in, kh, kw]
    (reference: core/initializer.py:9-12)."""
    fan_in = shape[0] if len(shape) == 2 else int(np.prod(shape[1:]))
    fan_out = shape[1] if len(shape) == 2 else shape[0]
    return fan_in, fan_out


class Initializer:
    """Draw an array and wrap it as a trainable float32 Tensor
    (reference contract: core/initializer.py:15-19)."""

    def __call__(self, shape):
        values = self.init(tuple(int(s) for s in shape))
        return Tensor(values, requires_grad=True, dtype=jnp.float32)

    def init(self, shape):
        raise NotImplementedError


class NormalInit(Initializer):

    def __init__(self, mean=0.0, std=1.0):
        self._mean = mean
        self._std = std

    def init(self, shape):
        return self._mean + self._std * jax.random.normal(
            next_key(), shape, dtype=jnp.float32
        )


class TruncatedNormalInit(Initializer):
    """N(mean, std) truncated to mean ± 2*std."""

    def __init__(self, mean=0.0, std=1.0):
        self._mean = mean
        self._std = std

    def init(self, shape):
        draw = jax.random.truncated_normal(
            next_key(), -2.0, 2.0, shape, dtype=jnp.float32
        )
        return self._mean + self._std * draw


class UniformInit(Initializer):

    def __init__(self, a=0.0, b=1.0):
        self._a = a
        self._b = b

    def init(self, shape):
        return jax.random.uniform(
            next_key(), shape, dtype=jnp.float32,
            minval=self._a, maxval=self._b,
        )


class ConstantInit(Initializer):

    def __init__(self, val):
        self._val = val

    def init(self, shape):
        return jnp.full(shape, self._val, dtype=jnp.float32)


class ZerosInit(ConstantInit):

    def __init__(self):
        super().__init__(0.0)


class OnesInit(ConstantInit):

    def __init__(self):
        super().__init__(1.0)


class XavierUniformInit(Initializer):
    """U(-a, a), a = gain * sqrt(6 / (fan_in + fan_out)) — Glorot & Bengio
    2010 (reference: core/initializer.py:69-86)."""

    def __init__(self, gain=1.0):
        self._gain = gain

    def init(self, shape):
        fan_in, fan_out = get_fans(shape)
        a = self._gain * np.sqrt(6.0 / (fan_in + fan_out))
        return jax.random.uniform(
            next_key(), shape, dtype=jnp.float32, minval=-a, maxval=a
        )


class XavierNormalInit(Initializer):
    """N(0, std), std = gain * sqrt(2 / (fan_in + fan_out))
    (reference: core/initializer.py:89-105)."""

    def __init__(self, gain=1.0):
        self._gain = gain

    def init(self, shape):
        fan_in, fan_out = get_fans(shape)
        std = self._gain * np.sqrt(2.0 / (fan_in + fan_out))
        return std * jax.random.normal(next_key(), shape, dtype=jnp.float32)


class HeUniformInit(Initializer):
    """U(-a, a), a = gain * sqrt(6 / fan_in) — He et al. 2015
    (reference: core/initializer.py:108-124)."""

    def __init__(self, gain=1.0):
        self._gain = gain

    def init(self, shape):
        fan_in, _ = get_fans(shape)
        a = self._gain * np.sqrt(6.0 / fan_in)
        return jax.random.uniform(
            next_key(), shape, dtype=jnp.float32, minval=-a, maxval=a
        )


class HeNormalInit(Initializer):
    """N(0, std), std = gain * sqrt(2 / fan_in)
    (reference: core/initializer.py:127-143)."""

    def __init__(self, gain=1.0):
        self._gain = gain

    def init(self, shape):
        fan_in, _ = get_fans(shape)
        std = self._gain * np.sqrt(2.0 / fan_in)
        return std * jax.random.normal(next_key(), shape, dtype=jnp.float32)
