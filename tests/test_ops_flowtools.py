"""Parity tests: vst.ops.flowtools vs the reference fbcCheckTorch math."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F
import jax.numpy as jnp

from vst.ops.flowtools import gradient, fbc_mask


def _rand(*shape, seed=0):
    rng = np.random.RandomState(seed)
    return rng.randn(*shape).astype(np.float32)


def _torch_gradient(x):
    dx = (F.pad(x, (0, 1, 0, 0))[:, :, 1:] - F.pad(x, (1, 0, 0, 0))[:, :, :-1]) / 2
    dy = (F.pad(x, (0, 0, 0, 1))[:, 1:, :] - F.pad(x, (0, 0, 1, 0))[:, :-1, :]) / 2
    return torch.stack([dx, dy])


def _torch_warp(x, f):
    B, C, H, W = x.size()
    xx = torch.arange(0, W).view(1, -1).repeat(H, 1).view(1, 1, H, W).repeat(B, 1, 1, 1)
    yy = torch.arange(0, H).view(-1, 1).repeat(1, W).view(1, 1, H, W).repeat(B, 1, 1, 1)
    grid = torch.cat((xx, yy), 1).float()
    vgrid = grid + f
    vx = 2.0 * vgrid[:, 0] / max(W - 1, 1) - 1.0
    vy = 2.0 * vgrid[:, 1] / max(H - 1, 1) - 1.0
    return F.grid_sample(x, torch.stack([vx, vy], dim=-1), align_corners=False)


def _torch_fbc(ff, bf, use_occlusion=True):
    """utils/flowtools.py:34-57 math re-expressed for goldens."""
    wf = _torch_warp(ff, bf)
    B, C, H, W = bf.size()
    mask = torch.ones((B, H, W))
    z = torch.tensor([0.0])
    norm_wb = torch.norm(wf + bf, dim=1) ** 2
    norm_w = torch.norm(wf, dim=1) ** 2
    norm_b = torch.norm(bf, dim=1) ** 2
    occ = norm_wb > 0.01 * (norm_w + norm_b) + 0.5
    grad_u = _torch_gradient(bf[:, 0])
    grad_v = _torch_gradient(bf[:, 1])
    norm_u = torch.norm(grad_u, dim=0) ** 2.0
    norm_v = torch.norm(grad_v, dim=0) ** 2.0
    mob = norm_u + norm_v > 0.01 * norm_b + 0.002
    if use_occlusion:
        mask = torch.where(occ, z, mask)
    mask = torch.where(mob, z, mask)
    return mask.unsqueeze(1)


def test_gradient_matches_torch():
    x = _rand(2, 6, 8, seed=1)
    got = gradient(jnp.asarray(x))
    want = _torch_gradient(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("use_occlusion", [True, False])
def test_fbc_mask_matches_torch(use_occlusion):
    # Smooth flows + a sharp motion boundary so both occ and mob terms fire.
    rng = np.random.RandomState(2)
    H, W = 24, 32
    ff = rng.randn(2, H, W, 2).astype(np.float32) * 0.5
    bf = -ff + rng.randn(2, H, W, 2).astype(np.float32) * 0.1
    bf[:, 10:, 16:, :] += 5.0  # motion boundary + inconsistency region

    got = fbc_mask(jnp.asarray(ff), jnp.asarray(bf), use_occlusion=use_occlusion)

    t_ff = torch.from_numpy(ff).permute(0, 3, 1, 2)
    t_bf = torch.from_numpy(bf).permute(0, 3, 1, 2)
    want = _torch_fbc(t_ff, t_bf, use_occlusion).permute(0, 2, 3, 1).numpy()
    got = np.asarray(got)
    # Masks are binary; threshold-crossing float jitter may flip isolated
    # pixels — require >99.9% agreement and identical means within 1e-3.
    agree = (got == want).mean()
    assert agree > 0.999, f"mask agreement {agree}"
    assert abs(got.mean() - want.mean()) < 1e-3
