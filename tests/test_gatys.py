"""OBST (Gatys) tests: LBFGS descent reduces the objective; warm start math;
full pyramid run produces a stylized image distinct from content."""

import numpy as np
import jax
import jax.numpy as jnp

from vst.models.gatys import OBST
from vst.perceptual.vgg import obst_prep, obst_postp
from vst.data.styles import load_style_images
import pytest

PYR = ((16, 16), (32, 32), (48, 48))


def _content(hw, seed=0):
    rng = np.random.RandomState(seed)
    return rng.rand(hw[0], hw[1], 3).astype(np.float32)


@pytest.mark.slow
def test_lbfgs_level_reduces_loss():
    obst = OBST(max_iters=(10, 5, 5), seed=0)
    style = load_style_images(size=64)[0]
    obst.set_style(style, PYR)

    img = obst_prep(jnp.asarray(_content((48, 48)))[None])
    content_feats = [
        f for f in obst.vgg.apply({"params": obst.vgg_params}, img, ["r42"])
    ]
    run = obst._level_fn((48, 48), 10)
    x, losses = run(
        img, obst.style_targets[2], content_feats,
        jnp.zeros_like(img), jnp.zeros_like(img), 0.0,
    )
    losses = np.asarray(losses)
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses


@pytest.mark.slow
def test_full_pyramid_run():
    obst = OBST(max_iters=(5, 4, 3), seed=0)
    style = load_style_images(size=64)[1]
    obst.set_style(style, PYR)

    content = _content((48, 48), seed=1)
    img = obst_prep(jnp.asarray(content)[None])
    mask = jnp.ones((1, 48, 48, 1))
    out = obst.run(img, img, mask, PYR, weight_tcl=0.0)
    assert out.shape == (1, 48, 48, 3)
    assert np.isfinite(np.asarray(out)).all()
    # result must have moved away from the content image
    assert float(jnp.abs(out - img).mean()) > 1e-3

    rgb = obst_postp(out)
    assert float(rgb.min()) >= 0.0 and float(rgb.max()) <= 1.0


@pytest.mark.slow
def test_tcl_term_pulls_toward_warp_target():
    """With a huge TCL weight the result must approach the warp target in
    masked regions."""
    obst = OBST(max_iters=(8,), seed=0)
    pyr = ((32, 32),)
    style = load_style_images(size=64)[0]
    obst.set_style(style, pyr)

    rng = np.random.RandomState(2)
    img = obst_prep(jnp.asarray(rng.rand(32, 32, 3).astype(np.float32))[None])
    target = obst_prep(jnp.asarray(rng.rand(32, 32, 3).astype(np.float32))[None])
    mask = jnp.ones((1, 32, 32, 1))

    out_free = obst.run(img, img, mask * 0.0, pyr, weight_tcl=0.0)
    # overwrite warp target path: warm-start pre acts as warp target
    out_tcl = obst.run(target, img, mask, pyr, weight_tcl=1e6)
    d_free = float(jnp.abs(out_free - target).mean())
    d_tcl = float(jnp.abs(out_tcl - target).mean())
    assert d_tcl < d_free


def test_warm_start_math():
    obst = OBST(seed=0)
    rng = np.random.RandomState(3)
    prev = jnp.asarray(rng.rand(1, 16, 16, 3).astype(np.float32))
    img = jnp.asarray(rng.rand(1, 16, 16, 3).astype(np.float32))
    bf = jnp.zeros((1, 16, 16, 2))
    # mask=0 → pre == img exactly
    mask0 = jnp.zeros((1, 16, 16, 1))
    np.testing.assert_allclose(
        np.asarray(obst.warm_start(prev, img, bf, mask0)), np.asarray(img)
    )
    # mask=1, zero flow → pre == warp(prev, 0) (the flowtools quirk resample)
    mask1 = jnp.ones((1, 16, 16, 1))
    from vst.ops.sample import warp as _warp

    np.testing.assert_allclose(
        np.asarray(obst.warm_start(prev, img, bf, mask1)),
        np.asarray(_warp(prev, bf)),
        rtol=1e-6,
    )
