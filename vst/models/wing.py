"""FAN face-alignment network (wing) — parity with
``StarGANv2Adv/core/wing.py``.

Used by StarGAN-v2 only when ``w_hpf > 0`` (facial high-pass masks); the
thesis runs ``w_hpf = 0`` everywhere, so this exists for inventory/API
completeness and for users bringing face datasets + the pretrained
``wing.ckpt`` (converter provided; a fresh-initialized FAN produces valid
shapes but meaningless landmarks).

Components: pre-activation ConvBlock with 1/2+1/4+1/4 channel split
(wing.py:154-188), CoordConv with optional radius/boundary channels
(:92-150), depth-4 HourGlass (:49-87), single-module FAN trunk (:190-246),
``get_heatmap`` with the 98-landmark mask preprocess pipeline
(truncate/min-max-normalize/shift/power, :437-539).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from vst.ops.image import avg_pool2d, resize_nearest, resize_bilinear


class _BN(nn.Module):
    """BatchNorm2d, inference mode (stored stats)."""

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        mean = self.param("running_mean", nn.initializers.zeros, (c,))
        var = self.param("running_var", nn.initializers.ones, (c,))
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        return (x - mean) / jnp.sqrt(var + 1e-5) * scale + bias


class _Conv(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    pad: int = 1
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        return nn.Conv(self.features, (self.kernel, self.kernel),
                       strides=(self.stride, self.stride),
                       padding=((self.pad, self.pad), (self.pad, self.pad)),
                       use_bias=self.use_bias)(x)


class ConvBlock(nn.Module):
    """wing.py:154-188."""

    out_planes: int

    @nn.compact
    def __call__(self, x):
        op = self.out_planes
        residual = x
        o1 = _Conv(op // 2, use_bias=False, name="conv1")(
            nn.relu(_BN(name="bn1")(x)))
        o2 = _Conv(op // 4, use_bias=False, name="conv2")(
            nn.relu(_BN(name="bn2")(o1)))
        o3 = _Conv(op // 4, use_bias=False, name="conv3")(
            nn.relu(_BN(name="bn3")(o2)))
        out = jnp.concatenate([o1, o2, o3], axis=-1)
        if x.shape[-1] != op:
            residual = _Conv(op, 1, pad=0, use_bias=False, name="downsample_conv")(
                nn.relu(_BN(name="downsample_bn")(x)))
        return out + residual


def _coords(h, w, with_r):
    xs = jnp.arange(h, dtype=jnp.float32)[:, None].repeat(w, 1)
    ys = jnp.arange(w, dtype=jnp.float32)[None, :].repeat(h, 0)
    xs = (xs / (h - 1)) * 2 - 1  # NOTE: reference names are swapped —
    ys = (ys / (w - 1)) * 2 - 1  # x varies along rows (wing.py:98-101)
    chans = [xs, ys]
    if with_r:
        rr = jnp.sqrt(xs ** 2 + ys ** 2)
        chans.append(rr / rr.max())
    return jnp.stack(chans, axis=-1)  # (h, w, 2 or 3)


class CoordConvTh(nn.Module):
    """wing.py:92-150: concat coord (+r, +boundary) channels, then conv.
    Returns (conv output, last 2 coord channels)."""

    height: int
    width: int
    with_r: bool
    with_boundary: bool
    first_one: bool
    out_channels: int
    kernel_size: int
    stride: int
    padding: int

    @nn.compact
    def __call__(self, x, heatmap=None):
        B = x.shape[0]
        coords = jnp.broadcast_to(
            _coords(self.height, self.width, self.with_r)[None],
            (B, self.height, self.width, 3 if self.with_r else 2),
        )
        if self.with_boundary and heatmap is not None:
            boundary = jnp.clip(heatmap[..., -1:], 0.0, 1.0)
            xs = _coords(self.height, self.width, False)[..., 0:1]
            ys = _coords(self.height, self.width, False)[..., 1:2]
            xx_b = jnp.where(boundary > 0.05, xs, 0.0)
            yy_b = jnp.where(boundary > 0.05, ys, 0.0)
            coords = jnp.concatenate([coords, xx_b, yy_b], axis=-1)
        ret = jnp.concatenate([x, coords], axis=-1)
        last = ret[..., -2:]
        out = _Conv(self.out_channels, self.kernel_size, self.stride,
                    self.padding, name="conv")(ret)
        return out, last


class HourGlass(nn.Module):
    """wing.py:49-87: depth-4 recursive encoder/decoder over ConvBlocks."""

    depth: int = 4
    first_one: bool = False

    @nn.compact
    def __call__(self, x, heatmap):
        x, last = CoordConvTh(64, 64, True, True, self.first_one,
                              out_channels=256, kernel_size=1, stride=1,
                              padding=0, name="coordconv")(x, heatmap)

        def level(inp, lv):
            up1 = ConvBlock(256, name=f"b1_{lv}")(inp)
            low1 = avg_pool2d(inp, 2, 2)
            low1 = ConvBlock(256, name=f"b2_{lv}")(low1)
            if lv > 1:
                low2 = level(low1, lv - 1)
            else:
                low2 = ConvBlock(256, name=f"b2_plus_{lv}")(low1)
            low3 = ConvBlock(256, name=f"b3_{lv}")(low2)
            up2 = resize_nearest(low3, 2)
            return up1 + up2

        return level(x, self.depth), last


class FAN(nn.Module):
    """wing.py:190-246, num_modules=1, 98 landmarks (+1 boundary)."""

    num_landmarks: int = 98

    @nn.compact
    def __call__(self, x):
        x, _ = CoordConvTh(256, 256, True, False, False, out_channels=64,
                           kernel_size=7, stride=2, padding=3,
                           name="conv1")(x)
        x = nn.relu(_BN(name="bn1")(x))
        x = avg_pool2d(ConvBlock(128, name="conv2")(x), 2, 2)
        x = ConvBlock(128, name="conv3")(x)
        x = ConvBlock(256, name="conv4")(x)

        ll, boundary = HourGlass(4, first_one=True, name="m0")(x, None)
        ll = ConvBlock(256, name="top_m_0")(ll)
        ll = nn.relu(_BN(name="bn_end0")(_Conv(256, 1, pad=0,
                                               name="conv_last0")(ll)))
        heat = _Conv(self.num_landmarks + 1, 1, pad=0, name="l0")(ll)
        return heat, boundary


# ---------------------------------------------------------------------------
# heatmap → mask preprocessing (wing.py:437-539)
# ---------------------------------------------------------------------------

IDX = {
    "chin": (8, 25), "eyebrows": (33, 51), "eyebrowsedges": (33, 46),
    "nose": (51, 55), "nostrils": (55, 60), "eyes": (60, 76),
    "lipedges": (76, 82), "lipupper": (77, 82), "liplower": (83, 88),
    "lipinner": (88, 96),
}


def _truncate(x, thres=0.1):
    return jnp.where(x < thres, 0.0, x)


def _minmax_normalize(x, eps=1e-6):
    B, H, W, C = x.shape
    flat = x.transpose(0, 3, 1, 2).reshape(B * C, -1)
    mx = flat.max(axis=1, keepdims=True)
    mn = flat.min(axis=1, keepdims=True)
    flat = (flat - mn) / (mx - mn + eps)
    return flat.reshape(B, C, H, W).transpose(0, 2, 3, 1)


def _shift(x, N):
    """Vertical circular shift by N rows (wing.py:459-477)."""
    if N == 0:
        return x
    return jnp.roll(x, N, axis=1)


def preprocess_heatmaps(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """98-channel landmark heatmaps (B, H, W, 98) → (mask, mask2) each
    (B, H, W, 1) — wing.py:494-539 (mask2 drops faceline/mouth/eyebrows)."""
    x = _truncate(x)
    x = _minmax_normalize(x)
    H = x.shape[1]
    sw = H // 256

    ops = {
        "chin": (0, 3), "eyebrows": (-7 * sw, 2), "nostrils": (8 * sw, 4),
        "lipupper": (-8 * sw, 4), "liplower": (8 * sw, 4),
        "lipinner": (-2 * sw, 3),
    }
    for part, (sh, power) in ops.items():
        s, e = IDX[part]
        seg = _shift(x[..., s:e], sh) ** power
        x = x.at[..., s:e].set(seg)

    zero = (list(range(0, IDX["chin"][0])) + list(range(IDX["chin"][1], 33))
            + [IDX["eyebrowsedges"][0], IDX["eyebrowsedges"][1],
               IDX["lipedges"][0], IDX["lipedges"][1]])
    x = x.at[..., jnp.asarray(zero)].set(0.0)

    s, e = IDX["nose"]
    x = x.at[..., s + 1:e].set(_shift(x[..., s + 1:e], 4 * sw))

    s, e = IDX["eyes"]
    eyes = x[..., s:e]
    x = x.at[..., s:e].set(_shift(eyes, -8) ** 3 + _shift(eyes, -24))

    x2 = x
    for part in ("chin", "eyebrows"):
        s, e = IDX[part]
        x2 = x2.at[..., s:e].set(0.0)
    x2 = x2.at[..., IDX["lipedges"][0]:IDX["lipinner"][1]].set(0.0)

    m1 = jnp.nan_to_num(jnp.sum(x, axis=-1, keepdims=True))
    m2 = jnp.nan_to_num(jnp.sum(x2, axis=-1, keepdims=True))
    return m1, m2


def get_heatmap(fan: FAN, params, x: jnp.ndarray, preprocess: bool = True):
    """wing.py:249-260: resize to 256, map [−1,1]→[0,1], run FAN, drop the
    boundary channel; with ``preprocess`` (default) 4× upsample
    (align_corners=True) + mask preprocessing, else the raw 64² heatmaps
    (the ``b_preprocess=False`` landmark path, wing.py:262-272)."""
    x = resize_bilinear(x, (256, 256), align_corners=False)
    x01 = x * 0.5 + 0.5
    heat, _ = fan.apply({"params": params}, x01)
    heat = heat[..., :-1]
    if not preprocess:
        return heat
    heat = resize_bilinear(heat, (256, 256), align_corners=True)
    return preprocess_heatmaps(heat)


def fan_params_from_torch(sd: dict) -> dict:
    """Convert the wing.ckpt state dict (keys like ``m0.b1_4.conv1.weight``,
    ``conv1.conv.weight``, ``bn1.{weight,bias,running_*}``)."""

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

    # classify each torch module: BN (has running_mean) vs conv (4-d weight)
    leaves_by_module: dict = {}
    for key, val in sd.items():
        parts = key.split(".")
        leaves_by_module.setdefault(".".join(parts[:-1]), {})[parts[-1]] = val

    for module, leaves in leaves_by_module.items():
        mods = module.split(".") if module else []
        # downsample Sequential: [bn, relu, conv] → index 0 = bn, 2 = conv
        fixed = []
        i = 0
        while i < len(mods):
            if mods[i] == "downsample" and i + 1 < len(mods):
                fixed.append("downsample_bn" if mods[i + 1] == "0"
                             else "downsample_conv")
                i += 2
                continue
            fixed.append(mods[i])
            i += 1

        if "running_mean" in leaves:  # BatchNorm
            put(fixed, "scale", _np(leaves["weight"]))
            put(fixed, "bias", _np(leaves["bias"]))
            put(fixed, "running_mean", _np(leaves["running_mean"]))
            put(fixed, "running_var", _np(leaves["running_var"]))
        elif "weight" in leaves and _np(leaves["weight"]).ndim == 4:  # Conv
            # our _Conv wraps an anonymous nn.Conv → <name>/Conv_0
            put(fixed + ["Conv_0"], "kernel",
                np.transpose(_np(leaves["weight"]), (2, 3, 1, 0)))
            if "bias" in leaves:
                put(fixed + ["Conv_0"], "bias", _np(leaves["bias"]))
    return out
