"""Parity tests: vst.ops.sample vs torch.nn.functional.grid_sample.

Goldens are computed with torch (CPU) using the same conventions as the
reference call-sites (flowtools.warp / RAFT bilinear_sampler / fs_lib.warp).
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F
import jax.numpy as jnp

from vst.ops.sample import grid_sample, bilinear_sample_pixel, warp, warp_masked


def _rand(*shape, seed=0):
    rng = np.random.RandomState(seed)
    return rng.randn(*shape).astype(np.float32)


@pytest.mark.parametrize("align_corners", [False, True])
def test_grid_sample_matches_torch(align_corners):
    img = _rand(2, 7, 9, 3, seed=1)
    # grids beyond [-1, 1] to exercise zero padding
    grid = (_rand(2, 5, 6, 2, seed=2) * 1.2).astype(np.float32)

    got = grid_sample(jnp.asarray(img), jnp.asarray(grid), align_corners=align_corners)

    t_img = torch.from_numpy(img).permute(0, 3, 1, 2)
    t_grid = torch.from_numpy(grid)
    want = F.grid_sample(t_img, t_grid, align_corners=align_corners)
    want = want.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


def test_grid_sample_border_matches_torch():
    img = _rand(1, 6, 8, 2, seed=3)
    grid = (_rand(1, 4, 4, 2, seed=4) * 1.5).astype(np.float32)
    got = grid_sample(jnp.asarray(img), jnp.asarray(grid), align_corners=True,
                      padding_mode="border")
    t_img = torch.from_numpy(img).permute(0, 3, 1, 2)
    want = F.grid_sample(t_img, torch.from_numpy(grid), align_corners=True,
                         padding_mode="border").permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


def test_bilinear_sample_pixel_exact_pixels():
    """Sampling at integer pixel coords returns the pixels themselves."""
    img = _rand(1, 5, 5, 2, seed=5)
    ys, xs = np.meshgrid(np.arange(5.0), np.arange(5.0), indexing="ij")
    got = bilinear_sample_pixel(
        jnp.asarray(img),
        jnp.asarray(xs[None]).astype(jnp.float32),
        jnp.asarray(ys[None]).astype(jnp.float32),
    )
    np.testing.assert_allclose(np.asarray(got), img, rtol=1e-6, atol=1e-6)


def _torch_warp_flowtools(x, f):
    """Reference math of utils/flowtools.py:18-32 re-expressed for goldens."""
    B, C, H, W = x.size()
    xx = torch.arange(0, W).view(1, -1).repeat(H, 1)
    yy = torch.arange(0, H).view(-1, 1).repeat(1, W)
    xx = xx.view(1, 1, H, W).repeat(B, 1, 1, 1)
    yy = yy.view(1, 1, H, W).repeat(B, 1, 1, 1)
    grid = torch.cat((xx, yy), 1).float()
    vgrid = grid + f
    vx = 2.0 * vgrid[:, 0] / max(W - 1, 1) - 1.0
    vy = 2.0 * vgrid[:, 1] / max(H - 1, 1) - 1.0
    vgrid = torch.stack([vx, vy], dim=-1)
    return F.grid_sample(x, vgrid, align_corners=False)


def test_warp_matches_flowtools_convention():
    img = _rand(2, 8, 10, 3, seed=6)
    flow = (_rand(2, 8, 10, 2, seed=7) * 3.0).astype(np.float32)

    got = warp(jnp.asarray(img), jnp.asarray(flow))

    t_x = torch.from_numpy(img).permute(0, 3, 1, 2)
    t_f = torch.from_numpy(flow).permute(0, 3, 1, 2)
    want = _torch_warp_flowtools(t_x, t_f).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_warp_identity_flow_near_identity():
    """Zero flow is NOT exact identity under the flowtools quirk (the
    W/(W-1) rescale + −0.5 shift) — verify against torch, and that the
    interior is close to the input."""
    img = _rand(1, 16, 16, 1, seed=8)
    flow = np.zeros((1, 16, 16, 2), np.float32)
    got = np.asarray(warp(jnp.asarray(img), jnp.asarray(flow)))
    t_x = torch.from_numpy(img).permute(0, 3, 1, 2)
    t_f = torch.from_numpy(flow).permute(0, 3, 1, 2)
    want = _torch_warp_flowtools(t_x, t_f).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def _torch_warp_fs_lib(x, flo):
    """Reference math of fs_lib.py:5-38 re-expressed for goldens."""
    B, C, H, W = x.size()
    xx = torch.arange(0, W).view(1, -1).repeat(H, 1).view(1, 1, H, W).repeat(B, 1, 1, 1)
    yy = torch.arange(0, H).view(-1, 1).repeat(1, W).view(1, 1, H, W).repeat(B, 1, 1, 1)
    grid = torch.cat((xx, yy), 1).float()
    vgrid = grid + flo
    vx = 2.0 * vgrid[:, 0] / max(W - 1, 1) - 1.0
    vy = 2.0 * vgrid[:, 1] / max(H - 1, 1) - 1.0
    vgrid = torch.stack([vx, vy], dim=-1)
    output = F.grid_sample(x, vgrid, align_corners=False)
    mask = F.grid_sample(torch.ones_like(x), vgrid, align_corners=False)
    mask = (mask >= 0.9999).float()
    return output * mask


def test_warp_masked_matches_fs_lib():
    img = _rand(2, 9, 11, 3, seed=9)
    flow = (_rand(2, 9, 11, 2, seed=10) * 4.0).astype(np.float32)
    got = warp_masked(jnp.asarray(img), jnp.asarray(flow))
    t_x = torch.from_numpy(img).permute(0, 3, 1, 2)
    t_f = torch.from_numpy(flow).permute(0, 3, 1, 2)
    want = _torch_warp_fs_lib(t_x, t_f).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)
