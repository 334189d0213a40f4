"""Batch-1 latency-optimized FastStyleNet forward (the DT benchmark path).

Same param tree as ``FastStyleNet.apply``; per-stage implementation chosen
by measurement (scripts/bisect_stages.py, scripts/ab_b1.py):

* stems: XLA convs in natural layout (stem1/head via the exact s2d
  rewrite inside ConvLayer's ``s2d_conv2d`` — the k=9 N=32/K=243 shapes
  leave the MXU idle in natural layout),
* residual trunk: ``res_block_pallas`` — per block TWO fused Pallas
  kernels (reflect-pad conv + IN-stats; inline norm+relu + conv +
  stats) and ONE XLA elementwise epilogue. XLA's version pays a stats
  pass, a normalize pass and a pad materialization per conv in HBM.
* decoder: ``up2_conv_subpixel_pallas`` — folded coarse-res conv with
  the depth-to-space applied in VMEM before the write (XLA's separate
  d2s pass alone costs 0.8 ms at the dec2 shape),
* head: s2d_conv2d + tanh epilogue.

Reference forward: methods/learning-based/network.py:263-298.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vst.kernels.pallas_conv import res_block_pallas, up2_conv_subpixel_pallas
from vst.kernels.s2d_conv import s2d_conv2d
from vst.models.faststyle_fast import _conv_w, _norm_affine
from vst.ops.image import reflect_pad
from vst.nn.norm import instance_norm


def _conv(x, w, b, stride=1, pad=1):
    return jax.lax.conv_general_dilated(
        reflect_pad(x, pad), w, (stride, stride), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b


def b1_stylize(params, x, style_strength=1.0, style_id=0, n_styles: int = 1,
               trunk: str = "pallas", decoder: str = "pallas"):
    """x: (1, H, W, 3), H, W divisible by 4. Returns (features, styled).

    ``trunk``/``decoder`` select per-stage implementations so the bench can
    fall back independently when a Pallas kernel is rejected by the TPU
    toolchain: trunk = "pallas" (fused res-block kernels) | "xla";
    decoder = "pallas" (in-VMEM subpixel) | "fold" (XLA folded coarse-res
    conv + d2s, the round-2 path). All combinations are exact forwards of
    the same param tree."""
    B, H, W, _ = x.shape
    assert B == 1 and H % 4 == 0 and W % 4 == 0

    def norm_relu(h, idx):
        scale, bias = _norm_affine(params, idx, n_styles, style_id)
        return jax.nn.relu(instance_norm(h) * scale + bias)

    # stems (9×9 via the exact s2d rewrite; 3×3 s2 natural)
    w, b = _conv_w(params, "ConvLayer_0", "TorchConv_0")
    h = norm_relu(s2d_conv2d(reflect_pad(x, 4), w, f=4) + b, 0)
    w, b = _conv_w(params, "ConvLayer_1", "TorchConv_0")
    h = norm_relu(_conv(h, w, b, stride=2), 1)
    w, b = _conv_w(params, "ConvLayer_2", "TorchConv_0")
    h = norm_relu(_conv(h, w, b, stride=2), 2)

    # residual trunk: fused Pallas res-blocks
    for i in range(5):
        blk = params[f"ResidualBlock_{i}"]
        strength = style_strength * blk["layer_strength"]
        strength = 2.0 * jnp.abs(strength) / (1.0 + jnp.abs(strength))
        w1, b1 = _conv_w(blk, "ConvLayer_0", "TorchConv_0")
        w2, b2 = _conv_w(blk, "ConvLayer_1", "TorchConv_0")
        n0 = blk["InstanceNorm_0"]
        n1 = blk["InstanceNorm_1"]
        if trunk == "pallas":
            h = res_block_pallas(
                h, w1, b1, n0["scale"], n0["bias"],
                w2, b2, n1["scale"], n1["bias"], strength)
        else:
            t = jax.nn.relu(
                instance_norm(_conv(h, w1, b1)) * n0["scale"] + n0["bias"])
            t = instance_norm(_conv(t, w2, b2)) * n1["scale"] + n1["bias"]
            h = strength * t + h

    features = h

    # decoder: fused subpixel up-convs
    if decoder == "pallas":
        def up2(h, w, b):
            return up2_conv_subpixel_pallas(h, w, b)
    else:
        from vst.kernels.layout import up2_conv_subpixel

        def up2(h, w, b):
            return up2_conv_subpixel(h, w) + b

    w, b = _conv_w(params, "UpsampleConvLayer_0", "TorchConv_0")
    h = norm_relu(up2(h, w, b), 3)
    w, b = _conv_w(params, "UpsampleConvLayer_1", "TorchConv_0")
    h = norm_relu(up2(h, w, b), 4)

    # head (9×9 → 3ch, tanh epilogue; network.py:292-296)
    w, b = _conv_w(params, "ConvTanh_0", "ConvLayer_0", "TorchConv_0")
    h = s2d_conv2d(reflect_pad(h, 4), w, f=4) + b
    h = jnp.tanh(h / 255.0) * 150.0 + 255.0 / 2.0
    return features, h
