"""StarGAN v1 — parity with ``methods/GAN-based/StarGAN/model.py``.

Single G/D multi-domain translation: G conditioned by a spatially-tiled
one-hot domain label concatenated to the input (model.py:56-63); D outputs
(patch source logits, domain classification logits) (:86-90).

Norms are InstanceNorm2d(affine=True, track_running_stats=True) — training
mode uses per-sample statistics (running stats only matter in torch eval
mode); we keep the training-mode semantics.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from vst.nn.norm import InstanceNorm
from vst.models.cyclegan import _ConvT
from vst.nn.init import conv_kernel_torch_default, conv_bias_torch_default


class _Conv(nn.Module):
    features: int
    kernel: int
    stride: int = 1
    pad: int = 0
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        fan_in = self.kernel * self.kernel * x.shape[-1]
        return nn.Conv(
            self.features, (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=((self.pad, self.pad), (self.pad, self.pad)),
            use_bias=self.use_bias,
            kernel_init=conv_kernel_torch_default,
            bias_init=conv_bias_torch_default(fan_in),
        )(x)


class ResidualBlock(nn.Module):
    """model.py:7-20: conv-IN-relu-conv-IN + skip, no-bias convs."""

    dim: int

    @nn.compact
    def __call__(self, x):
        y = _Conv(self.dim, 3, pad=1, use_bias=False)(x)
        y = nn.relu(InstanceNorm(affine=True)(y))
        y = _Conv(self.dim, 3, pad=1, use_bias=False)(y)
        y = InstanceNorm(affine=True)(y)
        return x + y


class Generator(nn.Module):
    """model.py:23-63."""

    conv_dim: int = 64
    c_dim: int = 5
    repeat_num: int = 6

    @nn.compact
    def __call__(self, x, c):
        """x: (B, H, W, 3) in [−1,1]; c: (B, c_dim) one-hot/soft labels."""
        B, H, W, _ = x.shape
        c_map = jnp.broadcast_to(c[:, None, None, :], (B, H, W, c.shape[-1]))
        h = jnp.concatenate([x, c_map], axis=-1)
        h = _Conv(self.conv_dim, 7, pad=3, use_bias=False)(h)
        h = nn.relu(InstanceNorm(affine=True)(h))

        dim = self.conv_dim
        for _ in range(2):
            h = _Conv(dim * 2, 4, stride=2, pad=1, use_bias=False)(h)
            h = nn.relu(InstanceNorm(affine=True)(h))
            dim *= 2

        for _ in range(self.repeat_num):
            h = ResidualBlock(dim)(h)

        for _ in range(2):
            h = _ConvT(dim // 2, kernel=4, torch_pad=1, out_pad=0)(h)
            h = nn.relu(InstanceNorm(affine=True)(h))
            dim //= 2

        h = _Conv(3, 7, pad=3, use_bias=False)(h)
        return jnp.tanh(h)


class Discriminator(nn.Module):
    """model.py:66-90: PatchGAN src head + global cls head."""

    image_size: int = 128
    conv_dim: int = 64
    c_dim: int = 5
    repeat_num: int = 6

    @nn.compact
    def __call__(self, x):
        h = nn.leaky_relu(_Conv(self.conv_dim, 4, stride=2, pad=1)(x), 0.01)
        dim = self.conv_dim
        for _ in range(1, self.repeat_num):
            h = nn.leaky_relu(_Conv(dim * 2, 4, stride=2, pad=1)(h), 0.01)
            dim *= 2
        k = self.image_size // (2 ** self.repeat_num)
        out_src = _Conv(1, 3, pad=1, use_bias=False)(h)
        out_cls = _Conv(self.c_dim, k, use_bias=False)(h)
        return out_src, out_cls.reshape(x.shape[0], self.c_dim)
