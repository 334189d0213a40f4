"""Image primitives (pad / resize / pool), NHWC, torch-parity semantics."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def reflect_pad(x: jnp.ndarray, pad: int) -> jnp.ndarray:
    """ReflectionPad2d equivalent on NHWC (reference:
    ``methods/learning-based/network.py:101-103``)."""
    if pad == 0:
        return x
    return jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")


def replicate_pad(x: jnp.ndarray, pad) -> jnp.ndarray:
    """ReplicationPad2d / F.pad(mode='replicate') on NHWC.

    pad: (left, right, top, bottom) — torch F.pad ordering
    (reference ``utils/raft/raft/utils/utils.py:19``).
    """
    l, r, t, b = pad
    return jnp.pad(x, ((0, 0), (t, b), (l, r), (0, 0)), mode="edge")


def resize_nearest(x: jnp.ndarray, scale: int) -> jnp.ndarray:
    """F.interpolate(mode='nearest', scale_factor=scale) for integer scale
    (reference ``network.py:188``: UpsampleConvLayer upsample)."""
    x = jnp.repeat(x, scale, axis=1)
    x = jnp.repeat(x, scale, axis=2)
    return x


def resize_bilinear(
    x: jnp.ndarray, out_hw, align_corners: bool = False
) -> jnp.ndarray:
    """F.interpolate(mode='bilinear') parity, NHWC.

    align_corners=True: src = i·(in−1)/(out−1)  (reference ``upflow8``,
    ``utils/raft/raft/utils/utils.py:80-82``).
    align_corners=False: src = max(0, (i+0.5)·in/out − 0.5) (torch's
    area_pixel_compute_source_index clamps at 0).
    """
    B, H, W, C = x.shape
    Ho, Wo = out_hw
    dtype = x.dtype if jnp.issubdtype(x.dtype, jnp.floating) else jnp.float32

    def src_coords(out_size, in_size):
        i = jnp.arange(out_size, dtype=dtype)
        if align_corners:
            if out_size == 1:
                return jnp.zeros((out_size,), dtype)
            return i * (in_size - 1) / (out_size - 1)
        s = (i + 0.5) * (in_size / out_size) - 0.5
        return jnp.maximum(s, 0.0)

    ys = src_coords(Ho, H)
    xs = src_coords(Wo, W)

    y0 = jnp.floor(ys).astype(jnp.int32)
    x0 = jnp.floor(xs).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, H - 1)
    x1 = jnp.minimum(x0 + 1, W - 1)
    wy1 = (ys - y0.astype(dtype))[None, :, None, None]
    wx1 = (xs - x0.astype(dtype))[None, None, :, None]
    wy0 = 1.0 - wy1
    wx0 = 1.0 - wx1

    r0 = x[:, y0, :, :]
    r1 = x[:, y1, :, :]
    v00 = r0[:, :, x0, :]
    v01 = r0[:, :, x1, :]
    v10 = r1[:, :, x0, :]
    v11 = r1[:, :, x1, :]
    return (v00 * wy0 * wx0 + v01 * wy0 * wx1 + v10 * wy1 * wx0 + v11 * wy1 * wx1).astype(x.dtype)


def avg_pool2d(x: jnp.ndarray, window: int = 2, stride: int = 2) -> jnp.ndarray:
    """F.avg_pool2d equivalent on NHWC (reference ``corr.py:26``)."""
    out = jax.lax.reduce_window(
        x,
        0.0,
        jax.lax.add,
        (1, window, window, 1),
        (1, stride, stride, 1),
        "VALID",
    )
    return out / (window * window)


class InputPadder:
    """Pads images so H, W are divisible by 8 — parity with
    ``utils/raft/raft/utils/utils.py:7-24`` (mode='sintel' centers the pad;
    otherwise pad bottom/right). Uses replicate padding."""

    def __init__(self, dims, mode: str = "sintel", mult: int = 8):
        # mult: reference parity is 8 (RAFT's own requirement). mult=64
        # additionally aligns EVERY corr-pyramid level to the TPU's
        # 8-sublane tiling (436->448: 1/8 grid 56 rows instead of 55,
        # then 28/14/7) — a perf option for the latency-bound GRU loop.
        self.ht, self.wd = dims[-3], dims[-2]  # NHWC
        pad_ht = (((self.ht // mult) + 1) * mult - self.ht) % mult
        pad_wd = (((self.wd // mult) + 1) * mult - self.wd) % mult
        if mode == "sintel":
            self._pad = [pad_wd // 2, pad_wd - pad_wd // 2, pad_ht // 2, pad_ht - pad_ht // 2]
        else:
            self._pad = [pad_wd // 2, pad_wd - pad_wd // 2, 0, pad_ht]

    def pad(self, *inputs):
        return [replicate_pad(x, self._pad) for x in inputs]

    def unpad(self, x):
        ht, wd = x.shape[1], x.shape[2]
        c = [self._pad[2], ht - self._pad[3], self._pad[0], wd - self._pad[1]]
        return x[:, c[0]:c[1], c[2]:c[3], :]
