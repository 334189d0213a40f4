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
        corr = avg_pool2d(corr, 2, 2)
        pyramid.append(corr)
    return tuple(pyramid)


def lookup_pyramid(
    pyramid: Tuple[jnp.ndarray, ...], coords: jnp.ndarray, radius: int,
    batch: int,
) -> jnp.ndarray:
    """coords: (B, H1, W1, 2) pixel coords into fmap2.
    Returns (B, H1, W1, num_levels·(2r+1)²), channel order matching the
    reference's ``corr.view(batch, h1, w1, -1)`` + level concat."""
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
        c = centroid / (2 ** i)
        x = c[..., 0] + da[None]
        y = c[..., 1] + db[None]
        sampled = bilinear_sample_pixel(corr, x, y)  # (BHW, n, n, 1)
        out.append(sampled.reshape(B, H, W, n * n))
    return jnp.concatenate(out, axis=-1)


class CorrPyramid:
    """Object wrapper for standalone use (build once, look up repeatedly)."""

    def __init__(self, fmap1, fmap2, num_levels: int = 4, radius: int = 4):
        self.radius = radius
        self.batch = fmap1.shape[0]
        self.pyramid = build_pyramid(fmap1, fmap2, num_levels)

    def lookup(self, coords: jnp.ndarray) -> jnp.ndarray:
        return lookup_pyramid(self.pyramid, coords, self.radius, self.batch)
