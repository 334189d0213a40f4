"""torch-default initializers, so training dynamics match the reference.

torch.nn.Conv2d default: kaiming_uniform(a=√5) on weight →
U(−b, b) with b = √(6 / ((1 + a²)·fan_in)) = √(1/fan_in);
bias: U(−1/√fan_in, 1/√fan_in).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def conv_kernel_torch_default(key, shape, dtype=jnp.float32):
    """flax Conv kernel init matching torch Conv2d's default.

    shape: (kh, kw, cin, cout); fan_in = kh·kw·cin.
    """
    kh, kw, cin, _ = shape
    fan_in = kh * kw * cin
    bound = float(np.sqrt(1.0 / fan_in))
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def conv_bias_torch_default(fan_in: int):
    bound = float(np.sqrt(1.0 / fan_in))

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def dense_kernel_torch_default(key, shape, dtype=jnp.float32):
    """torch.nn.Linear default on flax Dense kernel (in, out)."""
    fan_in = shape[0]
    bound = float(np.sqrt(1.0 / fan_in))
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def kaiming_normal_fan_out(key, shape, dtype=jnp.float32):
    """nn.init.kaiming_normal_(mode='fan_out', nonlinearity='relu') on a
    flax conv kernel (kh, kw, cin, cout) — used by the RAFT encoders
    (``utils/raft/raft/extractor.py:150-157``)."""
    kh, kw, _, cout = shape
    fan_out = kh * kw * cout
    std = float(np.sqrt(2.0 / fan_out))
    return jax.random.normal(key, shape, dtype) * std
