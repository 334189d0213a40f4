"""Layout-propagated FastStyleNet forward — the TPU fast path.

Numerically equivalent to ``FastStyleNet.apply`` on the SAME param tree, but
the stem and head never materialize a full-resolution (H, W, C) tensor:
activations stay in space-to-depth layouts end-to-end
(vst.kernels.layout), so

* the 9×9 stem/head convs run as 3×3 convs over 512 channels (proper MXU
  tiling instead of K=243/N=32 idle systolic array),
* the d2s/s2d HBM layout passes between stages disappear entirely
  (the only transposes left are the 3-channel input/output, ~5 MB),
* nearest 2× upsampling becomes a free channel duplication in phase space.

Layout flow (a = s2d factor of the T-space activation):
  T3 →s2d4→ S4 ─conv1(9,1,r4)→ S4·T32 ─conv2(3,2,r1)→ S2·T64
  ─conv3(3,2,r1)→ T128 (natural, ¼ res) ─5× residual blocks (natural)
  ─up2→ S2·T64(½) ─deconv1(3,1,r1)→ S2·T64 ─up2→ S4·T64(full)
  ─deconv2(3,1,r1)→ S4·T32 ─head(9,1,r4)→ S4·T3 →d2s→ T3
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from vst.kernels.layout import (
    s2d, d2s, s2d_conv_general, instance_norm_s2d, nearest_up2_s2d,
)
from vst.kernels.pallas_conv import conv3x3_reflect, res_chain_wants_pallas
from vst.ops.image import reflect_pad
from vst.nn.norm import instance_norm


def _conv_w(params, *path):
    node = params
    for p in path:
        node = node[p]
    return node["Conv_0"]["kernel"], node["Conv_0"]["bias"]


def _norm_affine(params, idx, n_styles, style_id):
    """Fold the (Conditional)InstanceNorm affine into one (scale, bias) pair:
    γ·(x̂·s + b) + β = x̂·(γ·s) + (γ·b + β)."""
    node = params[f"_Norm_{idx}"]
    if n_styles == 1:
        p = node["InstanceNorm_0"]
        return p["scale"], p["bias"]
    p = node["ConditionalInstanceNorm_0"]
    c = p["scale"].shape[0]
    gb = jnp.take(p["embed"], jnp.asarray(style_id, jnp.int32), axis=0,
                  mode="clip")
    gamma, beta = gb[:c], gb[c:]
    return gamma * p["scale"], gamma * p["bias"] + beta


def fast_stylize(params, x, style_strength=1.0, style_id=0,
                 n_styles: int = 1, trunk: str = "xla"):
    """params: FastStyleNet param tree (3-channel input variant);
    x: (B, H, W, 3) with H, W divisible by 4. Returns (features, styled) like
    the reference forward (network.py:281-298).

    trunk="pallas" routes the residual blocks through the fused
    res_block_pallas kernels (batched grid; exact same math) — the XLA
    trunk pays a pad materialization + stats pass + normalize pass per
    conv in HBM."""
    B, H, W, _ = x.shape
    assert H % 4 == 0 and W % 4 == 0, "fast path needs H, W divisible by 4"

    def norm_relu_s(h_s, a, idx, C):
        scale, bias = _norm_affine(params, idx, n_styles, style_id)
        h_s = instance_norm_s2d(h_s, a, C, scale, bias)
        return jax.nn.relu(h_s)

    # stem
    x_s = s2d(x, 4)
    w, b = _conv_w(params, "ConvLayer_0", "TorchConv_0")
    h = s2d_conv_general(x_s, w, a=4, stride=1, t_pad=4, pad_mode="reflect")
    h = norm_relu_s(h + jnp.tile(b, 16), 4, 0, 32)

    w, b = _conv_w(params, "ConvLayer_1", "TorchConv_0")
    h = s2d_conv_general(h, w, a=4, stride=2, t_pad=1, pad_mode="reflect")
    h = norm_relu_s(h + jnp.tile(b, 4), 2, 1, 64)

    w, b = _conv_w(params, "ConvLayer_2", "TorchConv_0")
    h = s2d_conv_general(h, w, a=2, stride=2, t_pad=1, pad_mode="reflect") + b
    scale, bias = _norm_affine(params, 2, n_styles, style_id)
    h = jax.nn.relu(instance_norm(h) * scale + bias)

    # residual blocks (natural layout, ¼ res); at b1 the reflect-pad+conv
    # runs as the fused Pallas kernel (pad rows/cols built in VMEM — XLA
    # materializes the pad concats in HBM, which erases the trunk's MXU
    # tiling advantage; see vst/kernels/pallas_conv.py)
    w_probe, _ = _conv_w(params["ResidualBlock_0"], "ConvLayer_0",
                         "TorchConv_0")
    use_pallas = res_chain_wants_pallas(h, w_probe)

    def trunk_conv(v, w, b):
        if use_pallas:
            return conv3x3_reflect(v, w, b)
        return jax.lax.conv_general_dilated(
            reflect_pad(v, 1), w, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + b

    for i in range(5):
        blk = params[f"ResidualBlock_{i}"]
        strength = style_strength * blk["layer_strength"]
        strength = 2.0 * jnp.abs(strength) / (1.0 + jnp.abs(strength))
        w1, b1 = _conv_w(blk, "ConvLayer_0", "TorchConv_0")
        w2, b2 = _conv_w(blk, "ConvLayer_1", "TorchConv_0")
        if trunk == "pallas":
            from vst.kernels.pallas_conv import res_block_pallas

            n0, n1 = blk["InstanceNorm_0"], blk["InstanceNorm_1"]
            h = res_block_pallas(
                h, w1, b1, n0["scale"], n0["bias"],
                w2, b2, n1["scale"], n1["bias"], strength)
            continue
        y = trunk_conv(h, w1, b1)
        y = instance_norm(y) * blk["InstanceNorm_0"]["scale"] + blk["InstanceNorm_0"]["bias"]
        y = jax.nn.relu(y)
        y = trunk_conv(y, w2, b2)
        y = instance_norm(y) * blk["InstanceNorm_1"]["scale"] + blk["InstanceNorm_1"]["bias"]
        h = strength * y + h

    features = h

    # decoder
    h = nearest_up2_s2d(h, 1, 128)  # S2 · T128 at ½ res
    w, b = _conv_w(params, "UpsampleConvLayer_0", "TorchConv_0")
    h = s2d_conv_general(h, w, a=2, stride=1, t_pad=1, pad_mode="reflect")
    h = norm_relu_s(h + jnp.tile(b, 4), 2, 3, 64)

    h = nearest_up2_s2d(h, 2, 64)  # S4 · T64 at full res
    w, b = _conv_w(params, "UpsampleConvLayer_1", "TorchConv_0")
    h = s2d_conv_general(h, w, a=4, stride=1, t_pad=1, pad_mode="reflect")
    h = norm_relu_s(h + jnp.tile(b, 16), 4, 4, 32)

    w, b = _conv_w(params, "ConvTanh_0", "ConvLayer_0", "TorchConv_0")
    h = s2d_conv_general(h, w, a=4, stride=1, t_pad=4, pad_mode="reflect")
    h = h + jnp.tile(b, 16)
    h = jnp.tanh(h / 255.0) * 150.0 + 255.0 / 2.0

    out = d2s(h, 4, 3)[:, :H, :W, :]
    return features, out
