"""Correlation pyramid parity vs the reference math (torch goldens)."""

import numpy as np
import torch
import torch.nn.functional as F
import jax.numpy as jnp

from vst.flow.corr import build_pyramid, lookup_pyramid


def _torch_corr_pyramid(f1, f2, num_levels=4):
    """corr.py:52-60 + pooling re-expressed with torch functional ops."""
    batch, dim, ht, wd = f1.shape
    f1v = f1.view(batch, dim, ht * wd)
    f2v = f2.view(batch, dim, ht * wd)
    corr = torch.matmul(f1v.transpose(1, 2), f2v)
    corr = corr.view(batch * ht * wd, 1, ht, wd) / torch.sqrt(torch.tensor(dim).float())
    pyr = [corr]
    for _ in range(num_levels - 1):
        corr = F.avg_pool2d(corr, 2, stride=2)
        pyr.append(corr)
    return pyr


def _torch_lookup(pyr, coords, r):
    """corr.py:29-50 re-expressed (coords: (B, H, W, 2) pixel xy)."""
    batch, h1, w1, _ = coords.shape
    out_pyramid = []
    for i, corr in enumerate(pyr):
        dx = torch.linspace(-r, r, 2 * r + 1)
        dy = torch.linspace(-r, r, 2 * r + 1)
        delta = torch.stack(torch.meshgrid(dy, dx, indexing="ij"), axis=-1)
        centroid = coords.reshape(batch * h1 * w1, 1, 1, 2) / 2 ** i
        coords_lvl = centroid + delta.view(1, 2 * r + 1, 2 * r + 1, 2)
        # bilinear_sampler (utils.py:57-71)
        H, W = corr.shape[-2:]
        xgrid, ygrid = coords_lvl.split([1, 1], dim=-1)
        xgrid = 2 * xgrid / (W - 1) - 1
        ygrid = 2 * ygrid / (H - 1) - 1
        grid = torch.cat([xgrid, ygrid], dim=-1)
        sampled = F.grid_sample(corr, grid, align_corners=True)
        out_pyramid.append(sampled.view(batch, h1, w1, -1))
    out = torch.cat(out_pyramid, dim=-1)
    return out  # (B, H, W, L·(2r+1)²) channel-last like ours


def test_corr_pyramid_and_lookup_parity():
    rng = np.random.RandomState(0)
    B, H, W, C = 2, 16, 24, 32
    f1 = rng.randn(B, H, W, C).astype(np.float32)
    f2 = rng.randn(B, H, W, C).astype(np.float32)
    coords = (rng.rand(B, H, W, 2) * np.array([W, H]) * 1.1 - 2).astype(np.float32)
    r = 4

    pyr = build_pyramid(jnp.asarray(f1), jnp.asarray(f2), num_levels=4)
    got = lookup_pyramid(pyr, jnp.asarray(coords), r, B)

    t1 = torch.from_numpy(f1).permute(0, 3, 1, 2)
    t2 = torch.from_numpy(f2).permute(0, 3, 1, 2)
    tpyr = _torch_corr_pyramid(t1, t2)
    want = _torch_lookup(tpyr, torch.from_numpy(coords), r).numpy()

    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-3, atol=2e-4)
