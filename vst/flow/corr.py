"""All-pairs correlation pyramid + windowed bilinear lookup.

Parity with ``utils/raft/raft/corr.py:12-60`` (CorrBlock): the full
(B·H1·W1, H2, W2) correlation volume is materialized once per frame pair
(one big MXU matmul — the TPU-friendly choice), average-pooled into a
4-level pyramid, then each GRU iteration gathers a (2r+1)² window per pixel
with bilinear sampling at **exact pixel coordinates** (the reference's
``bilinear_sampler`` normalizes by (size−1) and samples align_corners=True,
``utils/raft/raft/utils/utils.py:57-71`` — i.e. plain pixel-space bilinear
with zero padding).

Pure functions (pytree pyramid) so the lookup can live inside ``lax.scan``;
the gather is the hot non-conv op — vst.kernels provides a Pallas version,
this module is the pure-XLA reference implementation.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from vst.ops.image import avg_pool2d
from vst.ops.sample import bilinear_sample_pixel


def build_pyramid(
    fmap1: jnp.ndarray, fmap2: jnp.ndarray, num_levels: int = 4
) -> Tuple[jnp.ndarray, ...]:
    """All-pairs correlation pyramid. fmap1/2: (B, H, W, C) at 1/8 res.
    Returns num_levels arrays of shape (B·H1·W1, H2/2^i, W2/2^i, 1).

    HIGHEST matmul precision: the volume feeds 20+ recurrent lookups and
    flow parity is gated at 1% TCL; bf16 error compounds through the GRU.
    """
    B, H, W, C = fmap1.shape
    f1 = fmap1.reshape(B, H * W, C)
    f2 = fmap2.reshape(B, H * W, C)
    corr = jnp.einsum(
        "bnc,bmc->bnm", f1, f2,
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    ) / jnp.sqrt(jnp.asarray(C, jnp.float32))

    corr = corr.reshape(B * H * W, H, W, 1)
    pyramid = [corr]
    for _ in range(num_levels - 1):
        if corr.shape[1] < 2 or corr.shape[2] < 2:
            # tiny-input guard (tests): pooling a 1-pixel map would produce
            # an empty level; reuse the coarsest map instead. Real inputs
            # (H, W ≥ 64 → 1/8-res ≥ 8) never hit this.
            pyramid.append(corr)
            continue
        corr = avg_pool2d(corr, 2, 2)
        pyramid.append(corr)
    return tuple(pyramid)


def lookup_pyramid(
    pyramid: Tuple[jnp.ndarray, ...], coords: jnp.ndarray, radius: int,
    batch: int,
) -> jnp.ndarray:
    """coords: (B, H1, W1, 2) pixel coords into fmap2.
    Returns (B, H1, W1, num_levels·(2r+1)²), channel order matching the
    reference's ``corr.view(batch, h1, w1, -1)`` + level concat.

    Each query owns its own (h_i, w_i) correlation map, so the bilinear
    window sample is ONE flat 1-D gather per corner over the whole level
    (global index q·h·w + y·w + x) — 2.7× faster on TPU than the generic
    batched take_along_axis path, bit-identical output.
    """
    r = radius
    B, H, W, _ = coords.shape
    n = 2 * r + 1
    d = jnp.linspace(-r, r, n)
    # reference quirk (corr.py:37-43): delta = stack(meshgrid(dy, dx)) is
    # added to (x, y)-ordered coords, so the X offset varies along the FIRST
    # window axis and Y along the second. The sampled set is identical, but
    # the (2r+1)² channel enumeration is transposed vs. the intuitive
    # (y-major) order — pretrained BasicMotionEncoder weights depend on it.
    da, db = jnp.meshgrid(d, d, indexing="ij")

    out = []
    centroid = coords.reshape(B * H * W, 1, 1, 2)
    for i, corr in enumerate(pyramid):
        Q, h, w, _ = corr.shape
        c = centroid / (2 ** i)
        x = c[..., 0] + da[None]  # (Q, n, n)
        y = c[..., 1] + db[None]
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        wx1 = x - x0
        wy1 = y - y0
        x0i = x0.astype(jnp.int32)
        y0i = y0.astype(jnp.int32)

        corr_flat = corr.reshape(Q * h * w)
        qbase = (jnp.arange(Q, dtype=jnp.int32) * (h * w))[:, None, None]

        def corner(yi, xi, wgt):
            valid = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
            idx = (qbase
                   + jnp.clip(yi, 0, h - 1) * w
                   + jnp.clip(xi, 0, w - 1))
            v = jnp.take(corr_flat, idx.reshape(-1), mode="clip")
            return v.reshape(Q, n, n) * wgt * valid

        s = (
            corner(y0i, x0i, (1 - wy1) * (1 - wx1))
            + corner(y0i, x0i + 1, (1 - wy1) * wx1)
            + corner(y0i + 1, x0i, wy1 * (1 - wx1))
            + corner(y0i + 1, x0i + 1, wy1 * wx1)
        )
        out.append(s.reshape(B, H, W, n * n))
    return jnp.concatenate(out, axis=-1)


class CorrPyramid:
    """Object wrapper for standalone use (build once, look up repeatedly)."""

    def __init__(self, fmap1, fmap2, num_levels: int = 4, radius: int = 4):
        self.radius = radius
        self.batch = fmap1.shape[0]
        self.pyramid = build_pyramid(fmap1, fmap2, num_levels)

    def lookup(self, coords: jnp.ndarray) -> jnp.ndarray:
        return lookup_pyramid(self.pyramid, coords, self.radius, self.batch)
