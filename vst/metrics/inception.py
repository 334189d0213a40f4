"""InceptionV3 feature extractor for FID (flax, NHWC).

Parity with the torchvision ``inception_v3`` trunk the reference slices
(``utils/metrics/fid.py:27-53``): Conv2d_1a…Conv2d_4a with two 3×3/2
max-pools, Mixed_5b…Mixed_6e, Mixed_7a…Mixed_7c, global average pool →
2048-d activations. The reference calls the blocks directly in a
``nn.Sequential``, bypassing torchvision's ``_transform_input`` — inputs are
whatever the eval loader produced (reproduced in vst.metrics.fid).

BasicConv2d = conv(bias=False) + BatchNorm(eps=1e-3) (+ReLU); batch norm
runs off stored statistics (inference net). A torchvision state-dict
converter is provided; without it the net is seeded (FID *values* then
differ from the reference, rankings and mechanics are identical).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn


class BasicConv2d(nn.Module):
    features: int
    kernel: Sequence[int]
    stride: int = 1
    pad: Sequence[int] = (0, 0)

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel
        ph, pw = self.pad
        x = nn.Conv(
            self.features, (kh, kw), strides=(self.stride, self.stride),
            padding=((ph, ph), (pw, pw)), use_bias=False, name="conv",
        )(x)
        c = self.features
        mean = self.param("bn_mean", nn.initializers.zeros, (c,))
        var = self.param("bn_var", nn.initializers.ones, (c,))
        scale = self.param("bn_scale", nn.initializers.ones, (c,))
        bias = self.param("bn_bias", nn.initializers.zeros, (c,))
        x = (x - mean) / jnp.sqrt(var + 1e-3) * scale + bias
        return nn.relu(x)


def _maxpool3s2(x):
    return nn.max_pool(x, (3, 3), strides=(2, 2))


def _avgpool3s1p1(x):
    s = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)],
    )
    ones = jnp.ones_like(x[..., :1])
    n = jax.lax.reduce_window(
        ones, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)],
    )
    # torchvision uses count_include_pad=True (divide by 9 everywhere)
    return s / 9.0


class InceptionA(nn.Module):
    pool_features: int

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(64, (1, 1), name="branch1x1")(x)
        b5 = BasicConv2d(48, (1, 1), name="branch5x5_1")(x)
        b5 = BasicConv2d(64, (5, 5), pad=(2, 2), name="branch5x5_2")(b5)
        b3 = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        b3 = BasicConv2d(96, (3, 3), pad=(1, 1), name="branch3x3dbl_2")(b3)
        b3 = BasicConv2d(96, (3, 3), pad=(1, 1), name="branch3x3dbl_3")(b3)
        bp = _avgpool3s1p1(x)
        bp = BasicConv2d(self.pool_features, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(384, (3, 3), stride=2, name="branch3x3")(x)
        bd = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(96, (3, 3), pad=(1, 1), name="branch3x3dbl_2")(bd)
        bd = BasicConv2d(96, (3, 3), stride=2, name="branch3x3dbl_3")(bd)
        bp = _maxpool3s2(x)
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    channels_7x7: int

    @nn.compact
    def __call__(self, x):
        c7 = self.channels_7x7
        b1 = BasicConv2d(192, (1, 1), name="branch1x1")(x)
        b7 = BasicConv2d(c7, (1, 1), name="branch7x7_1")(x)
        b7 = BasicConv2d(c7, (1, 7), pad=(0, 3), name="branch7x7_2")(b7)
        b7 = BasicConv2d(192, (7, 1), pad=(3, 0), name="branch7x7_3")(b7)
        bd = BasicConv2d(c7, (1, 1), name="branch7x7dbl_1")(x)
        bd = BasicConv2d(c7, (7, 1), pad=(3, 0), name="branch7x7dbl_2")(bd)
        bd = BasicConv2d(c7, (1, 7), pad=(0, 3), name="branch7x7dbl_3")(bd)
        bd = BasicConv2d(c7, (7, 1), pad=(3, 0), name="branch7x7dbl_4")(bd)
        bd = BasicConv2d(192, (1, 7), pad=(0, 3), name="branch7x7dbl_5")(bd)
        bp = _avgpool3s1p1(x)
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(192, (1, 1), name="branch3x3_1")(x)
        b3 = BasicConv2d(320, (3, 3), stride=2, name="branch3x3_2")(b3)
        b7 = BasicConv2d(192, (1, 1), name="branch7x7x3_1")(x)
        b7 = BasicConv2d(192, (1, 7), pad=(0, 3), name="branch7x7x3_2")(b7)
        b7 = BasicConv2d(192, (7, 1), pad=(3, 0), name="branch7x7x3_3")(b7)
        b7 = BasicConv2d(192, (3, 3), stride=2, name="branch7x7x3_4")(b7)
        bp = _maxpool3s2(x)
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(320, (1, 1), name="branch1x1")(x)
        b3 = BasicConv2d(384, (1, 1), name="branch3x3_1")(x)
        b3a = BasicConv2d(384, (1, 3), pad=(0, 1), name="branch3x3_2a")(b3)
        b3b = BasicConv2d(384, (3, 1), pad=(1, 0), name="branch3x3_2b")(b3)
        b3 = jnp.concatenate([b3a, b3b], axis=-1)
        bd = BasicConv2d(448, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(384, (3, 3), pad=(1, 1), name="branch3x3dbl_2")(bd)
        bda = BasicConv2d(384, (1, 3), pad=(0, 1), name="branch3x3dbl_3a")(bd)
        bdb = BasicConv2d(384, (3, 1), pad=(1, 0), name="branch3x3dbl_3b")(bd)
        bd = jnp.concatenate([bda, bdb], axis=-1)
        bp = _avgpool3s1p1(x)
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3Trunk(nn.Module):
    """Pool3 activations (B, 2048) — the FID feature."""

    @nn.compact
    def __call__(self, x):
        x = BasicConv2d(32, (3, 3), stride=2, name="Conv2d_1a_3x3")(x)
        x = BasicConv2d(32, (3, 3), name="Conv2d_2a_3x3")(x)
        x = BasicConv2d(64, (3, 3), pad=(1, 1), name="Conv2d_2b_3x3")(x)
        x = _maxpool3s2(x)
        x = BasicConv2d(80, (1, 1), name="Conv2d_3b_1x1")(x)
        x = BasicConv2d(192, (3, 3), name="Conv2d_4a_3x3")(x)
        x = _maxpool3s2(x)
        x = InceptionA(32, name="Mixed_5b")(x)
        x = InceptionA(64, name="Mixed_5c")(x)
        x = InceptionA(64, name="Mixed_5d")(x)
        x = InceptionB(name="Mixed_6a")(x)
        x = InceptionC(128, name="Mixed_6b")(x)
        x = InceptionC(160, name="Mixed_6c")(x)
        x = InceptionC(160, name="Mixed_6d")(x)
        x = InceptionC(192, name="Mixed_6e")(x)
        x = InceptionD(name="Mixed_7a")(x)
        x = InceptionE(name="Mixed_7b")(x)
        x = InceptionE(name="Mixed_7c")(x)
        return jnp.mean(x, axis=(1, 2))  # adaptive avg pool to 1×1


def inception_params_from_torch(sd: dict) -> dict:
    """Convert a torchvision inception_v3 state dict (keys like
    ``Mixed_5b.branch1x1.conv.weight`` / ``.bn.{weight,bias,running_*}``)."""

    def _np(t):
        try:
            return t.detach().cpu().numpy()
        except AttributeError:
            return np.asarray(t)

    out: dict = {}

    def put(path, leaf, v):
        node = out
        for p in path:
            node = node.setdefault(p, {})
        node[leaf] = v

    for key, val in sd.items():
        parts = key.split(".")
        if parts[0].startswith(("AuxLogits", "fc")):
            continue
        *mods, unit, leaf = parts  # ... conv/bn, weight/bias/...
        path = mods
        if unit == "conv" and leaf == "weight":
            put(path + ["conv"], "kernel",
                np.transpose(_np(val), (2, 3, 1, 0)))
        elif unit == "bn":
            name = {"weight": "bn_scale", "bias": "bn_bias",
                    "running_mean": "bn_mean", "running_var": "bn_var"}.get(leaf)
            if name:
                put(path, name, _np(val))
    return out
