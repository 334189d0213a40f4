"""Parity tests: gram / tv / normalize vs the reference math."""

import numpy as np
import torch
import jax.numpy as jnp

from vst.ops.losses import gram_matrix, tv_loss, normalize_imagenet, IMAGENET_MEAN, IMAGENET_STD


def _rand(*shape, seed=0):
    rng = np.random.RandomState(seed)
    return rng.randn(*shape).astype(np.float32)


def test_gram_matches_torch():
    x = _rand(3, 7, 9, 5, seed=1)
    got = gram_matrix(jnp.asarray(x))
    t = torch.from_numpy(x).permute(0, 3, 1, 2)
    b, c, h, w = t.size()
    f = t.reshape(b, c, h * w)
    want = torch.bmm(f, f.transpose(1, 2)).div(h * w).numpy()
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_tv_matches_torch():
    x = _rand(2, 8, 8, 3, seed=2)
    got = tv_loss(jnp.asarray(x))
    I = torch.from_numpy(x).permute(0, 3, 1, 2)
    sij = I[:, :, :-1, :-1]
    si1j = I[:, :, :-1, 1:]
    sij1 = I[:, :, 1:, :-1]
    tv1 = torch.norm(sij1 - sij, dim=1) ** 2
    tv2 = torch.norm(si1j - sij, dim=1) ** 2
    want = torch.sum((tv1 + tv2) ** 0.5).item()
    np.testing.assert_allclose(float(got), want, rtol=1e-5)


def test_tv_reference_axis_convention():
    """fast_style_transfer.py:795-803: sij1 indexes torch dim 2 (H) and si1j
    dim 3 (W) — i.e. the names are swapped vs. intuition. Verify our NHWC
    mapping keeps the same value for an asymmetric input."""
    x = np.zeros((1, 4, 6, 1), np.float32)
    x[0, :, 3, 0] = 1.0  # vertical edge: only W-direction diffs fire
    got = float(tv_loss(jnp.asarray(x)))
    I = torch.from_numpy(x).permute(0, 3, 1, 2)
    sij = I[:, :, :-1, :-1]
    si1j = I[:, :, :-1, 1:]
    sij1 = I[:, :, 1:, :-1]
    want = torch.sum(
        (torch.norm(sij1 - sij, dim=1) ** 2 + torch.norm(si1j - sij, dim=1) ** 2) ** 0.5
    ).item()
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_normalize():
    x = np.abs(_rand(1, 4, 4, 3, seed=3))
    got = np.asarray(normalize_imagenet(jnp.asarray(x)))
    want = (x - np.array(IMAGENET_MEAN, np.float32)) / np.array(IMAGENET_STD, np.float32)
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_tv_loss_zero_gradient_at_flat_regions():
    """sqrt-at-0 subgradient: a perfectly flat image must give ZERO TV
    gradients, not NaN (TPU bf16 rounding makes exact zeros common; NaN
    propagates even through a 0 loss weight)."""
    import jax

    x = jnp.ones((1, 8, 8, 3))
    g = jax.grad(lambda x: 0.0 * tv_loss(x))(x)
    assert np.isfinite(np.asarray(g)).all()
    g2 = jax.grad(tv_loss)(x)
    assert np.isfinite(np.asarray(g2)).all()
    np.testing.assert_array_equal(np.asarray(g2), 0.0)
