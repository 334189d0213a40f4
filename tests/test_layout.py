"""Layout-propagated conv algebra: every op vs its natural-layout reference."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from vst.kernels.layout import (
    s2d, d2s, s2d_conv_general, instance_norm_s2d, nearest_up2_s2d,
    reflect_pad_s2d,
)
from vst.ops.image import reflect_pad, resize_nearest
from vst.nn.norm import instance_norm


def _conv_ref(x, w, stride, pad, mode):
    if pad > 0:
        if mode == "reflect":
            x = reflect_pad(x, pad)
        else:
            x = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def test_s2d_d2s_roundtrip():
    x = jnp.asarray(np.random.RandomState(0).randn(2, 16, 24, 3).astype(np.float32))
    np.testing.assert_array_equal(np.asarray(d2s(s2d(x, 4), 4, 3)), np.asarray(x))


CASES = [
    # (k, a, stride, t_pad, ci, co, pad_mode) — the FastStyleNet stages
    (9, 4, 1, 4, 3, 8, "reflect"),    # conv1
    (3, 4, 2, 1, 8, 16, "zero"),      # conv2
    (3, 2, 2, 1, 16, 32, "zero"),     # conv3
    (3, 2, 1, 1, 32, 16, "reflect"),  # deconv1 conv
    (3, 4, 1, 1, 16, 8, "reflect"),   # deconv2 conv
    (9, 4, 1, 4, 8, 3, "reflect"),    # ConvTanh head
]


@pytest.mark.parametrize("k,a,stride,t_pad,ci,co,pad_mode", CASES)
def test_s2d_conv_general_matches_natural(k, a, stride, t_pad, ci, co, pad_mode):
    rng = np.random.RandomState(k * a + stride)
    H, W = 32, 48
    x = jnp.asarray(rng.randn(1, H, W, ci).astype(np.float32))
    w = jnp.asarray(rng.randn(k, k, ci, co).astype(np.float32) * 0.1)

    ref = _conv_ref(x, w, stride, t_pad, pad_mode)
    b = a // stride
    got_s = s2d_conv_general(s2d(x, a), w, a, stride, t_pad, pad_mode,
                             out_t_hw=ref.shape[1:3])
    got = d2s(got_s, b, co)[:, :ref.shape[1], :ref.shape[2], :]
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("k,a,stride,t_pad,ci,co,pad_mode", CASES)
def test_s2d_conv_phase_matches_natural(k, a, stride, t_pad, ci, co, pad_mode):
    from vst.kernels.layout import s2d_conv_phase

    rng = np.random.RandomState(k * a + stride + 7)
    H, W = 32, 48
    x = jnp.asarray(rng.randn(2, H, W, ci).astype(np.float32))
    w = jnp.asarray(rng.randn(k, k, ci, co).astype(np.float32) * 0.1)

    ref = _conv_ref(x, w, stride, t_pad, pad_mode)
    b = a // stride
    got_s = s2d_conv_phase(s2d(x, a), w, a, stride, t_pad, pad_mode)
    got = d2s(got_s, b, co)[:, :ref.shape[1], :ref.shape[2], :]
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_instance_norm_s2d_matches_natural():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 16, 16, 8).astype(np.float32))
    scale = jnp.asarray(rng.randn(8).astype(np.float32))
    bias = jnp.asarray(rng.randn(8).astype(np.float32))
    ref = instance_norm(x) * scale + bias
    got_s = instance_norm_s2d(s2d(x, 4), 4, 8, scale, bias)
    got = d2s(got_s, 4, 8)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_nearest_up2_s2d_matches_natural():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1, 8, 12, 4).astype(np.float32))
    ref = resize_nearest(x, 2)
    got = d2s(nearest_up2_s2d(s2d(x, 2), 2, 4), 4, 4)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_reflect_pad_s2d_values():
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(1, 16, 16, 2).astype(np.float32))
    a = 4
    xs = s2d(x, a)
    padded = reflect_pad_s2d(xs, a, 2, pad_t=4, rows_s=(1, 1), cols_s=(1, 1))
    # the padded S tensor, d2s'd, must equal reflect_pad(x, 4) on the
    # region both cover (padded covers 4 T px each side here)
    got = d2s(padded, a, 2)
    ref = reflect_pad(x, a)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.slow
@pytest.mark.parametrize("n_styles,sid,ss", [(1, 0, 1.0), (3, 2, 0.7)])
def test_fast_stylize_equivalent_to_reference_forward(n_styles, sid, ss):
    """The layout-propagated forward must reproduce FastStyleNet.apply on
    the same param tree (it is the bench fast path)."""
    from vst.models.faststyle import FastStyleNet
    from vst.models.faststyle_fast import fast_stylize

    m = FastStyleNet(n_styles=n_styles)
    x = jnp.asarray(np.random.RandomState(0).rand(1, 32, 48, 3).astype(np.float32))
    p = m.init(jax.random.PRNGKey(1), x, ss, sid)["params"]
    f_ref, y_ref = m.apply({"params": p}, x, ss, sid)
    f_fast, y_fast = fast_stylize(p, x, ss, sid, n_styles=n_styles)
    np.testing.assert_allclose(np.asarray(y_fast), np.asarray(y_ref),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(f_fast), np.asarray(f_ref),
                               rtol=1e-4, atol=1e-3)


def test_up2_conv_subpixel_exact():
    """Folding must reproduce reflect_pad∘conv∘nearest_up2 bit-for-bit
    (same dtype, same conv op) including edges."""
    from vst.kernels.layout import up2_conv_subpixel
    from vst.ops.image import reflect_pad, resize_nearest

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
