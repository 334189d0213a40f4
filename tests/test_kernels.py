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


@pytest.mark.parametrize("H,W,C", [
    (40, 128, 128),   # 3 row tiles: first/interior/tail branches all hit
    (16, 128, 128),   # single-tile grid (n_tiles == 1 branch)
    (109, 256, 128),  # the production Johnson trunk shape
])
def test_pallas_conv3x3_reflect_exact(H, W, C):
    """Fused pad+conv must match reflect_pad∘conv∘+bias exactly (f32:
    same tap order, f32 accumulation)."""
    from vst.kernels.pallas_conv import conv3x3_reflect, conv3x3_reflect_ref

    rng = np.random.RandomState(H + W)
    x = jnp.asarray(rng.randn(1, H, W, C).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, C, C).astype(np.float32) * 0.05)
    b = jnp.asarray(rng.randn(C).astype(np.float32) * 0.1)
    got = conv3x3_reflect(x, w, b)
    ref = conv3x3_reflect_ref(x, w, b)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-4)


@pytest.mark.slow
def test_fast_stylize_pallas_trunk_matches_reference_forward():
    """At a b1 shape that passes res_chain_wants_pallas, fast_stylize's
    Pallas trunk must still reproduce FastStyleNet.apply."""
    from vst.models.faststyle import FastStyleNet
    from vst.models.faststyle_fast import fast_stylize
    from vst.kernels.pallas_conv import res_chain_wants_pallas

    import os

    # reference forward OUTSIDE the opt-in scope → pure-XLA path
    m = FastStyleNet(n_styles=1)
    x = jnp.asarray(
        np.random.RandomState(0).rand(1, 192, 512, 3).astype(np.float32))
    p = m.init(jax.random.PRNGKey(1), x, 1.0, 0)["params"]
    f_ref, y_ref = m.apply({"params": p}, x, 1.0, 0)

    os.environ["VST_PALLAS_CONV"] = "1"
    try:
        # trunk shape check: (1, 48, 128, 128) engages the kernel
        assert res_chain_wants_pallas(
            jnp.zeros((1, 48, 128, 128)), jnp.zeros((3, 3, 128, 128)))
        f_fast, y_fast = fast_stylize(p, x, 1.0, 0, n_styles=1)
        np.testing.assert_allclose(np.asarray(y_fast), np.asarray(y_ref),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(f_fast), np.asarray(f_ref),
                                   rtol=1e-4, atol=1e-3)
    finally:
        del os.environ["VST_PALLAS_CONV"]


@pytest.mark.parametrize("h,w,ci,co", [
    (20, 128, 128, 64),   # dec1-like, 3 tiles
    (8, 128, 64, 32),     # single tile
])
def test_up2_conv_subpixel_pallas_exact(h, w, ci, co):
    """Fused coarse-conv + in-VMEM d2s must match the folded subpixel
    stage (itself bit-exact vs up2∘reflect-pad∘conv, test above)."""
    from vst.kernels.layout import up2_conv_subpixel
    from vst.kernels.pallas_conv import up2_conv_subpixel_pallas

    rng = np.random.RandomState(h + ci)
    x = jnp.asarray(rng.randn(1, h, w, ci).astype(np.float32))
    wk = jnp.asarray(rng.randn(3, 3, ci, co).astype(np.float32) * 0.05)
    b = jnp.asarray(rng.randn(co).astype(np.float32) * 0.1)
    ref = up2_conv_subpixel(x, wk) + b
    got = up2_conv_subpixel_pallas(x, wk, b)
    assert got.shape == ref.shape == (1, 2 * h, 2 * w, co)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-4)
    # grads route through the exact XLA formulation
    g1 = jax.grad(lambda k: up2_conv_subpixel_pallas(x, k, b).sum())(wk)
    g2 = jax.grad(lambda k: (up2_conv_subpixel(x, k) + b).sum())(wk)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-5, atol=1e-4)


@pytest.mark.slow
@pytest.mark.parametrize("n_styles,sid,ss", [(1, 0, 1.0), (3, 2, 0.7)])
def test_b1_stylize_matches_reference_forward(n_styles, sid, ss):
    """The latency path (fused Pallas res-blocks + subpixel decoder) must
    reproduce FastStyleNet.apply on the same param tree."""
    from vst.models.faststyle import FastStyleNet
    from vst.models.faststyle_b1 import b1_stylize

    m = FastStyleNet(n_styles=n_styles)
    x = jnp.asarray(
        np.random.RandomState(0).rand(1, 64, 128, 3).astype(np.float32))
    p = m.init(jax.random.PRNGKey(1), x, ss, sid)["params"]
    f_ref, y_ref = m.apply({"params": p}, x, ss, sid)
    f_b1, y_b1 = b1_stylize(p, x, ss, sid, n_styles=n_styles)
    np.testing.assert_allclose(np.asarray(y_b1), np.asarray(y_ref),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(f_b1), np.asarray(f_ref),
                               rtol=1e-4, atol=1e-3)


def test_res_block_pallas_matches_xla_block():
    from vst.kernels.pallas_conv import res_block_pallas
    from vst.ops.image import reflect_pad
    from vst.nn.norm import instance_norm

    rng = np.random.RandomState(0)
    H, W, C = 40, 128, 128
    h = jnp.asarray(rng.randn(1, H, W, C).astype(np.float32))
    w1, w2 = (jnp.asarray(rng.randn(3, 3, C, C).astype(np.float32) * 0.05)
              for _ in range(2))
    b1, b2, be1, be2 = (jnp.asarray(rng.randn(C).astype(np.float32) * 0.1)
                        for _ in range(4))
    g1, g2 = (jnp.asarray(rng.rand(C).astype(np.float32) + 0.5)
              for _ in range(2))

    def conv(v, w, b):
        return jax.lax.conv_general_dilated(
            reflect_pad(v, 1), w, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + b

    y = jax.nn.relu(instance_norm(conv(h, w1, b1)) * g1 + be1)
    ref = 0.8 * (instance_norm(conv(y, w2, b2)) * g2 + be2) + h
    got = res_block_pallas(h, w1, b1, g1, be1, w2, b2, g2, be2, 0.8)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)

    # batched: grid gains a batch axis; instance-norm stats stay
    # per-sample (must NOT average across the batch)
    hb = jnp.asarray(rng.randn(3, 24, 128, C).astype(np.float32))
    yb = jax.nn.relu(instance_norm(conv(hb, w1, b1)) * g1 + be1)
    refb = 0.8 * (instance_norm(conv(yb, w2, b2)) * g2 + be2) + hb
    gotb = res_block_pallas(hb, w1, b1, g1, be1, w2, b2, g2, be2, 0.8)
    np.testing.assert_allclose(np.asarray(gotb), np.asarray(refb),
                               rtol=1e-4, atol=1e-4)


def test_fast_stylize_pallas_trunk_matches_apply():
    """fast_stylize(trunk='pallas') (batched fused res-blocks) is an exact
    forward of the same param tree."""
    from vst.models.faststyle import FastStyleNet
    from vst.models.faststyle_fast import fast_stylize

    rng = np.random.RandomState(5)
    m = FastStyleNet(n_styles=3)
    x = jnp.asarray(rng.rand(2, 32, 128, 3).astype(np.float32))
    p = m.init(jax.random.PRNGKey(0), x[:1], 1.0, 0)["params"]
    _, want = m.apply({"params": p}, x, 0.9, 2)
    _, got = fast_stylize(p, x, 0.9, 2, n_styles=3, trunk="pallas")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-3)


def test_pallas_layout_passes_exact_and_adjoint():
    """pallas_s2d/pallas_d2s register relayouts vs the XLA reshapes, plus
    the adjoint VJP pair, plus s2d_conv2d's B=1 route through them."""
    from vst.kernels.layout import s2d, d2s
    from vst.kernels.pallas_conv import pallas_d2s, pallas_s2d

    rng = np.random.RandomState(2)
    x_s = jnp.asarray(rng.randn(1, 10, 32, 48).astype(np.float32))
    np.testing.assert_array_equal(np.asarray(pallas_d2s(x_s, 4, 3)),
                                  np.asarray(d2s(x_s, 4, 3)))
    x = jnp.asarray(rng.randn(1, 40, 128, 32).astype(np.float32))
    np.testing.assert_array_equal(np.asarray(pallas_s2d(x, 4)),
                                  np.asarray(s2d(x, 4)))
    g = jax.grad(lambda v: (pallas_s2d(v, 4) ** 2).sum())(x)
    np.testing.assert_allclose(np.asarray(g), np.asarray(2 * x), rtol=1e-6)

    w = jnp.asarray(rng.randn(9, 9, 3, 8).astype(np.float32) * 0.1)
    xi = jnp.asarray(rng.randn(1, 40, 48, 3).astype(np.float32))
    ref = jax.lax.conv_general_dilated(
        xi, w, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    got = s2d_conv2d(xi, w, f=4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


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


@pytest.mark.parametrize("B,H,R", [(2, 13, 4), (1, 12, 4), (3, 7, 8)])
def test_conv3x3_block_pallas_batched_awkward_tiles(B, H, R):
    """The v3 sidecar-halo kernel at H % row_tile ≠ 0 (boundary-pad row
    patched inside the final grid-padded block), batched, with pre_norm —
    y and the per-sample (sum, sumsq) stats must match the XLA math."""
    from vst.kernels.pallas_conv import (conv3x3_block_pallas,
                                         conv3x3_reflect_ref)

    rng = np.random.RandomState(B * 100 + H)
    W, C = 16, 8
    x = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, C, C).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.randn(C).astype(np.float32))
    mu = x.mean((1, 2))
    inv = 1.0 / (x.std((1, 2)) + 1e-3)
    g = jnp.asarray(rng.rand(C).astype(np.float32) + 0.5)
    be = jnp.asarray(rng.randn(C).astype(np.float32))
    y, st = conv3x3_block_pallas(x, w, b, pre_norm=(mu, inv, g, be),
                                 row_tile=R)
    xn = jax.nn.relu((x - mu[:, None, None]) * (inv[:, None, None] * g) + be)
    ref = conv3x3_reflect_ref(xn, w, b)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               rtol=1e-5, atol=1e-4)
    s_ref = jnp.stack([ref.sum((1, 2)), (ref * ref).sum((1, 2))], 1)
    np.testing.assert_allclose(np.asarray(st), np.asarray(s_ref),
                               rtol=1e-4, atol=1e-3)
