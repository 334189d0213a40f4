"""Bilinear sampling / warping primitives (NHWC).

The reference mixes THREE grid_sample conventions; TCL parity depends on
reproducing each exactly at its call-site (SURVEY.md §7 "hard parts" #1):

1. ``utils/flowtools.py:18-32`` (``warp``): vgrid normalized by ``W-1`` then
   ``F.grid_sample(..., align_corners=False)`` → effective sample point
   ``x' = (x+u)·W/(W-1) − 0.5``.
2. ``utils/raft/raft/utils/utils.py:57-71`` (``bilinear_sampler``): normalized
   by ``W-1`` with ``align_corners=True`` → exact pixel coordinates.
3. ``methods/learning-based/fs_lib.py:5-38`` (``warp``): same normalization as
   (1), grid_sample default (align_corners=False), plus a ones-mask sampled
   through the same grid, binarized at 0.9999 and multiplied into the output.

All use bilinear interpolation with zero padding.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _unnormalize(g: jnp.ndarray, size: int, align_corners: bool) -> jnp.ndarray:
    """Map a normalized grid coordinate in [-1, 1] to a pixel coordinate.

    Matches torch.nn.functional.grid_sample's ``grid_sampler_unnormalize``.
    """
    if align_corners:
        return (g + 1.0) * 0.5 * (size - 1)
    return ((g + 1.0) * size - 1.0) * 0.5


def _gather2d(img: jnp.ndarray, yi: jnp.ndarray, xi: jnp.ndarray) -> jnp.ndarray:
    """Gather img[b, yi, xi, :] for integer index maps.

    img: (B, H, W, C); yi, xi: (B, Ho, Wo) int32 (already clipped in-range).
    Returns (B, Ho, Wo, C).
    """
    B, H, W, C = img.shape
    flat = img.reshape(B, H * W, C)
    idx = (yi * W + xi).reshape(B, -1, 1)
    out = jnp.take_along_axis(flat, idx, axis=1)
    return out.reshape(B, yi.shape[1], yi.shape[2], C)


def bilinear_sample_pixel(
    img: jnp.ndarray,
    x: jnp.ndarray,
    y: jnp.ndarray,
    padding_mode: str = "zeros",
) -> jnp.ndarray:
    """Bilinear sample img at float pixel coordinates (x, y), zero padding.

    img: (B, H, W, C); x, y: (B, Ho, Wo) float pixel coords.
    ``padding_mode='zeros'`` matches torch grid_sample zeros-padding: each of
    the four neighbours contributes 0 if it lies outside the image.
    ``padding_mode='border'`` clips the float coordinate first.
    """
    B, H, W, C = img.shape
    compute_dtype = img.dtype if jnp.issubdtype(img.dtype, jnp.floating) else jnp.float32
    x = x.astype(compute_dtype)
    y = y.astype(compute_dtype)

    if padding_mode == "border":
        x = jnp.clip(x, 0.0, W - 1)
        y = jnp.clip(y, 0.0, H - 1)
    elif padding_mode != "zeros":
        raise ValueError(f"unsupported padding_mode: {padding_mode}")

    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    wx1 = x - x0f
    wy1 = y - y0f
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1

    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)
    x1 = x0 + 1
    y1 = y0 + 1

    def corner(yi, xi, w):
        if padding_mode == "zeros":
            valid = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
            w = w * valid.astype(compute_dtype)
        yi = jnp.clip(yi, 0, H - 1)
        xi = jnp.clip(xi, 0, W - 1)
        return _gather2d(img, yi, xi) * w[..., None]

    out = (
        corner(y0, x0, wy0 * wx0)
        + corner(y0, x1, wy0 * wx1)
        + corner(y1, x0, wy1 * wx0)
        + corner(y1, x1, wy1 * wx1)
    )
    return out


def grid_sample(
    img: jnp.ndarray,
    grid: jnp.ndarray,
    align_corners: bool = False,
    padding_mode: str = "zeros",
) -> jnp.ndarray:
    """torch.nn.functional.grid_sample equivalent (bilinear), NHWC.

    img: (B, H, W, C); grid: (B, Ho, Wo, 2) normalized (x, y) in [-1, 1].
    """
    B, H, W, C = img.shape
    x = _unnormalize(grid[..., 0], W, align_corners)
    y = _unnormalize(grid[..., 1], H, align_corners)
    return bilinear_sample_pixel(img, x, y, padding_mode=padding_mode)


def _base_grid(B: int, H: int, W: int, dtype) -> jnp.ndarray:
    """Pixel-coordinate base grid (B, H, W, 2), channel 0 = x, 1 = y."""
    xx = jnp.arange(W, dtype=dtype)[None, :].repeat(H, axis=0)
    yy = jnp.arange(H, dtype=dtype)[:, None].repeat(W, axis=1)
    grid = jnp.stack([xx, yy], axis=-1)  # (H, W, 2)
    return jnp.broadcast_to(grid[None], (B, H, W, 2))


def warp(x: jnp.ndarray, flow: jnp.ndarray) -> jnp.ndarray:
    """Backward warp, exact parity with ``utils/flowtools.py:18-32``.

    x: (B, H, W, C) image to sample from; flow: (B, H, W, 2) pixel
    displacements (u, v). The reference normalizes by ``max(W-1,1)`` /
    ``max(H-1,1)`` but samples with ``align_corners=False`` — an intentional
    quirk that effectively samples at ``(x+u)·W/(W-1) − 0.5``.
    """
    B, H, W, C = x.shape
    dtype = x.dtype if jnp.issubdtype(x.dtype, jnp.floating) else jnp.float32
    vgrid = _base_grid(B, H, W, dtype) + flow.astype(dtype)
    gx = 2.0 * vgrid[..., 0] / max(W - 1, 1) - 1.0
    gy = 2.0 * vgrid[..., 1] / max(H - 1, 1) - 1.0
    grid = jnp.stack([gx, gy], axis=-1)
    return grid_sample(x, grid, align_corners=False)


def warp_masked(x: jnp.ndarray, flow: jnp.ndarray) -> jnp.ndarray:
    """Backward warp with validity-mask zeroing, parity with
    ``methods/learning-based/fs_lib.py:5-38``.

    Warps both the input and an all-ones mask through the same grid
    (align_corners=False, zeros padding), binarizes the mask at 0.9999, and
    returns the masked warped output (mask folded in, not returned).
    """
    B, H, W, C = x.shape
    dtype = x.dtype if jnp.issubdtype(x.dtype, jnp.floating) else jnp.float32
    vgrid = _base_grid(B, H, W, dtype) + flow.astype(dtype)
    gx = 2.0 * vgrid[..., 0] / max(W - 1, 1) - 1.0
    gy = 2.0 * vgrid[..., 1] / max(H - 1, 1) - 1.0
    grid = jnp.stack([gx, gy], axis=-1)
    out = grid_sample(x, grid, align_corners=False)
    ones = jnp.ones_like(x)
    mask = grid_sample(ones, grid, align_corners=False)
    mask = jnp.where(mask < 0.9999, 0.0, 1.0).astype(out.dtype)
    return out * mask
