"""vst.kernels: exactness of the fast compute paths."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from vst.kernels.s2d_conv import s2d_conv2d


@pytest.mark.parametrize("k,f,ci,co,hw", [
    (9, 4, 3, 32, (48, 64)),
    (9, 2, 3, 32, (48, 64)),
    (9, 4, 32, 3, (40, 40)),   # the ConvTanh head shape
    (7, 4, 3, 16, (33, 41)),   # odd spatial dims
])
def test_s2d_conv_exact(k, f, ci, co, hw):
    rng = np.random.RandomState(k * f)
    x = jnp.asarray(rng.randn(2, hw[0] + k - 1, hw[1] + k - 1, ci).astype(np.float32))
    w = jnp.asarray(rng.randn(k, k, ci, co).astype(np.float32) * 0.1)
    ref = jax.lax.conv_general_dilated(
        x, w, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    got = s2d_conv2d(x, w, f=f)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_s2d_conv_gradients_flow():
    """The kernel rearrangement must be differentiable wrt the original w."""
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, 20, 20, 3).astype(np.float32))
    w = jnp.asarray(rng.randn(9, 9, 3, 4).astype(np.float32) * 0.1)

    def loss_fast(w):
        return jnp.sum(s2d_conv2d(x, w, f=4) ** 2)

    def loss_ref(w):
        y = jax.lax.conv_general_dilated(
            x, w, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return jnp.sum(y ** 2)

    g_fast = jax.grad(loss_fast)(w)
    g_ref = jax.grad(loss_ref)(w)
    np.testing.assert_allclose(np.asarray(g_fast), np.asarray(g_ref),
                               rtol=1e-3, atol=1e-4)


@pytest.mark.slow
def test_pallas_corr_lookup_matches_xla():
    """The Pallas window-sampling kernel vs the exact XLA gather path
    (tolerance covers the kernel's bf16 interpolation multiplies on TPU;
    interpret mode on CPU is exact)."""
    from vst.flow.corr import build_pyramid, lookup_pyramid
    from vst.kernels.pallas_corr import pallas_lookup_pyramid

    B, H, W, C = 1, 8, 16, 32
    f1 = jax.random.normal(jax.random.PRNGKey(0), (B, H, W, C))
    f2 = jax.random.normal(jax.random.PRNGKey(1), (B, H, W, C))
    pyr = build_pyramid(f1, f2, num_levels=4)
    coords = jax.random.normal(jax.random.PRNGKey(2), (B, H, W, 2)) * 5 + 6
    ref = lookup_pyramid(pyr, coords, 4, B)
    got = pallas_lookup_pyramid(pyr, coords, 4, B)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=5e-3, atol=5e-2)


@pytest.mark.slow
def test_raft_pallas_lookup_flow_close():
    """Full RAFT with the Pallas lookup must produce flow close to the
    exact path (same weights)."""
    from vst.flow.raft import RAFT

    rng = np.random.RandomState(3)
    i1 = jnp.asarray(rng.rand(1, 64, 96, 3).astype(np.float32) * 255)
    i2 = jnp.asarray(rng.rand(1, 64, 96, 3).astype(np.float32) * 255)
    r_exact = RAFT(small=False, iters=4, pallas_lookup=False)
    r_fast = RAFT(small=False, iters=4, pallas_lookup=True)
    p = r_exact.init(jax.random.PRNGKey(0), i1, i2)
    _, f_exact = r_exact.apply(p, i1, i2)
    _, f_fast = r_fast.apply(p, i1, i2)
    err = float(jnp.abs(f_exact - f_fast).max())
    assert err < 0.05, err


def test_via_conv_relayouts_exact_and_in_s2d_conv2d(monkeypatch):
    """Identity-conv relayouts (s2d/d2s as stride-f convs) are bitwise vs
    the XLA reshape∘transpose forms, and s2d_conv2d's VST_S2D_VIA_CONV
    route stays exact vs the direct conv."""
    from vst.kernels.layout import d2s, d2s_via_conv, s2d, s2d_via_conv

    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.randn(1, 44, 104, 3).astype(np.float32))
    np.testing.assert_array_equal(np.asarray(s2d_via_conv(x, 4)),
                                  np.asarray(s2d(x, 4)))
    y = jnp.asarray(rng.randn(1, 11, 26, 48).astype(np.float32))
    np.testing.assert_array_equal(np.asarray(d2s_via_conv(y, 4, 3)),
                                  np.asarray(d2s(y, 4, 3)))

    w = jnp.asarray(rng.randn(9, 9, 3, 8).astype(np.float32) * 0.1)
    xi = jnp.asarray(rng.randn(1, 40, 48, 3).astype(np.float32))
    ref = jax.lax.conv_general_dilated(
        xi, w, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    monkeypatch.setenv("VST_S2D_VIA_CONV", "1")
    got = s2d_conv2d(xi, w, f=4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)
