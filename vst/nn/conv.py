"""Convolution blocks (NHWC), torch-parity semantics."""

from __future__ import annotations

from typing import Optional, Tuple, Union

import jax.numpy as jnp
import flax.linen as nn

from vst.nn.init import conv_kernel_torch_default, conv_bias_torch_default
from vst.ops.image import reflect_pad, resize_nearest


class TorchConv(nn.Module):
    """nn.Conv with torch Conv2d default init and explicit symmetric padding.

    padding: int (symmetric zero-pad, torch ``padding=p``) or 'VALID'.
    kernel_size may be an (kh, kw) tuple (RAFT SepConvGRU uses (1,5)/(5,1)).
    """

    features: int
    kernel_size: Union[int, Tuple[int, int]]
    stride: int = 1
    padding: Union[int, Tuple[int, int], str] = 0
    use_bias: bool = True
    dtype: Optional[jnp.dtype] = None  # compute dtype (params stay f32)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        ks = self.kernel_size
        if isinstance(ks, int):
            ks = (ks, ks)
        pad = self.padding
        if isinstance(pad, int):
            pad = ((pad, pad), (pad, pad))
        elif isinstance(pad, tuple):
            pad = ((pad[0], pad[0]), (pad[1], pad[1]))
        fan_in = ks[0] * ks[1] * x.shape[-1]
        return nn.Conv(
            self.features,
            ks,
            strides=(self.stride, self.stride),
            padding=pad if not isinstance(pad, str) else pad,
            use_bias=self.use_bias,
            dtype=self.dtype,
            kernel_init=conv_kernel_torch_default,
            bias_init=conv_bias_torch_default(fan_in),
        )(x)


class ConvLayer(nn.Module):
    """Reflection-padded convolution, parity with
    ``methods/learning-based/network.py:97-108`` (pad = ⌊k/2⌋ reflect, then
    VALID conv with the given stride).

    Large stride-1 kernels (k ≥ 7) take the exact space-to-depth fast path
    (vst.kernels.s2d_conv) — XLA's direct lowering of the 9×9 stem/head
    convs leaves the MXU ~98% idle (see kernels module docstring). Same
    params, same math, ~2× on the Sintel-res stem."""

    features: int
    kernel_size: int
    stride: int = 1
    use_bias: bool = True
    fast_s2d: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        pad = self.kernel_size // 2
        x = reflect_pad(x, pad)
        if self.fast_s2d and self.stride == 1 and self.kernel_size >= 7:
            # param tree named/shaped exactly like the TorchConv path so
            # checkpoints are interchangeable between fast/reference paths
            return _S2DConv(
                self.features, self.kernel_size, self.use_bias,
                name="TorchConv_0",
            )(x)
        return TorchConv(
            self.features, self.kernel_size, stride=self.stride,
            padding="VALID", use_bias=self.use_bias,
        )(x)


class _S2DConv(nn.Module):
    """Param-compatible with TorchConv (nested Conv_0 scope holding
    kernel/bias) but computing through the s2d fast path."""

    features: int
    kernel_size: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        from vst.kernels.s2d_conv import s2d_conv2d
        from vst.nn.init import conv_kernel_torch_default, conv_bias_torch_default

        ks = self.kernel_size
        cin = x.shape[-1]
        fan_in = ks * ks * cin

        class _Inner(nn.Module):
            features: int

            @nn.compact
            def __call__(inner_self, x):
                kernel = inner_self.param(
                    "kernel", conv_kernel_torch_default,
                    (ks, ks, cin, inner_self.features),
                )
                y = s2d_conv2d(x, kernel, f=4)
                if self.use_bias:
                    bias = inner_self.param(
                        "bias", conv_bias_torch_default(fan_in),
                        (inner_self.features,),
                    )
                    y = y + bias
                return y

        return _Inner(self.features, name="Conv_0")(x)


class UpsampleConvLayer(nn.Module):
    """Nearest-upsample then reflection-padded conv, parity with
    ``network.py:173-191`` (avoids transposed-conv checkerboard).

    The standard (upsample=2, k=3, s=1) decoder stage takes the exact
    subpixel fast path (vst.kernels.layout.up2_conv_subpixel): the kernel is
    folded per output phase so the whole stage runs at the COARSE
    resolution followed by depth-to-space — identical math (unit-tested
    bit-exact), no 4× nearest-upsampled intermediate, 4·Co matmul lanes.
    Decoder stages are ~40% of FastStyleNet's batch-1 latency."""

    features: int
    kernel_size: int
    stride: int = 1
    upsample: Optional[int] = None
    fast_subpixel: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if (self.fast_subpixel and self.upsample == 2
                and self.kernel_size == 3 and self.stride == 1):
            return _SubpixelUpConv(self.features, name="TorchConv_0")(x)
        if self.upsample:
            x = resize_nearest(x, self.upsample)
        pad = self.kernel_size // 2
        x = reflect_pad(x, pad)
        return TorchConv(
            self.features, self.kernel_size, stride=self.stride, padding="VALID"
        )(x)


class _SubpixelUpConv(nn.Module):
    """Param-compatible with TorchConv (nested Conv_0 kernel/bias) but
    computing nearest-up2 ∘ reflect-pad ∘ conv3×3 via the folded coarse-res
    subpixel conv."""

    features: int

    @nn.compact
    def __call__(self, x):
        from vst.kernels.layout import up2_conv_subpixel
        from vst.nn.init import conv_kernel_torch_default, conv_bias_torch_default

        cin = x.shape[-1]
        fan_in = 9 * cin
        features = self.features

        class _Inner(nn.Module):
            @nn.compact
            def __call__(inner_self, x):
                kernel = inner_self.param(
                    "kernel", conv_kernel_torch_default, (3, 3, cin, features))
                bias = inner_self.param(
                    "bias", conv_bias_torch_default(fan_in), (features,))
                return up2_conv_subpixel(x, kernel) + bias

        return _Inner(name="Conv_0")(x)


class ConvTanh(nn.Module):
    """Output head, parity with ``network.py:111-118``:
    tanh(conv(x)/255)·150 + 127.5 — outputs roughly [−22.5, 277.5] pixels."""

    features: int
    kernel_size: int
    stride: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        out = ConvLayer(self.features, self.kernel_size, stride=self.stride)(x)
        return jnp.tanh(out / 255.0) * 150.0 + 255.0 / 2.0
