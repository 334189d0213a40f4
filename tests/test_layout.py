"""Layout/subpixel kernel algebra: every surviving op vs its natural-layout
reference. (The layout-propagated whole-network program — s2d_conv_general
and the phase-space pointwise stages — was deleted in round 4 along with
its faststyle_fast/b1 consumers; see vst/kernels/layout.py docstring.)"""

import numpy as np
import jax
import jax.numpy as jnp

from vst.kernels.layout import s2d, d2s
from vst.ops.image import reflect_pad, resize_nearest


def test_s2d_d2s_roundtrip():
    x = jnp.asarray(np.random.RandomState(0).randn(2, 16, 24, 3).astype(np.float32))
    np.testing.assert_array_equal(np.asarray(d2s(s2d(x, 4), 4, 3)), np.asarray(x))


def test_up2_conv_subpixel_exact():
    """Folding must reproduce reflect_pad∘conv∘nearest_up2 bit-for-bit
    (same dtype, same conv op) including edges."""
    from vst.kernels.layout import up2_conv_subpixel

    rng = np.random.RandomState(0)
    for ci, co, h, w in [(8, 4, 5, 7), (3, 8, 16, 12)]:
        x = jnp.asarray(rng.randn(2, h, w, ci).astype(np.float32))
        k = jnp.asarray(rng.randn(3, 3, ci, co).astype(np.float32) * 0.1)
        up = reflect_pad(resize_nearest(x, 2), 1)
        ref = jax.lax.conv_general_dilated(
            up, k, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        got = up2_conv_subpixel(x, k)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)


def test_up2_conv_subpixel4_exact():
    from vst.kernels.layout import up2_conv_subpixel, up2_conv_subpixel4

    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(2, 6, 9, 8).astype(np.float32))
    k = jnp.asarray(rng.randn(3, 3, 8, 4).astype(np.float32) * 0.1)
    np.testing.assert_allclose(np.asarray(up2_conv_subpixel4(x, k)),
                               np.asarray(up2_conv_subpixel(x, k)),
                               rtol=1e-5, atol=1e-5)
