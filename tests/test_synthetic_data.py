"""The affine-motion generator is an analytic flow oracle: warping frame i
through the backward flow must reproduce frame i+1 wherever the mask is on
(the reference's datagen sanity check, coco-generation.py:224-228)."""

import numpy as np
import jax.numpy as jnp

from vst.data.synthetic import synthetic_batch, AffineMotionGenerator, _texture
from vst.ops.sample import bilinear_sample_pixel


def test_batch_shapes():
    b = synthetic_batch(2, hw=(64, 64), n_frames=3, seed=0)
    assert b["imgs"].shape == (2, 3, 64, 64, 3)
    assert b["flows"].shape == (2, 2, 64, 64, 2)
    assert b["masks"].shape == (2, 2, 64, 64, 1)
    assert b["imgs"].min() >= 0.0 and b["imgs"].max() <= 1.0
    assert 0.3 < b["masks"].mean() <= 1.0


def test_warp_oracle():
    """Exact-pixel sampling of frame_i at grid+backward_flow == frame_{i+1}
    in masked regions (small interpolation tolerance)."""
    rng = np.random.RandomState(3)
    gen = AffineMotionGenerator(crop_hw=(96, 96), seed=4)
    frames, flows, masks = gen.generate(_texture(rng, (192, 192)), n_frames=2)

    H, W = 96, 96
    ys, xs = np.meshgrid(np.arange(H, dtype=np.float32),
                         np.arange(W, dtype=np.float32), indexing="ij")
    bf = flows[0]
    x = (xs + bf[..., 0])[None]
    y = (ys + bf[..., 1])[None]
    warped = np.asarray(
        bilinear_sample_pixel(jnp.asarray(frames[0][None]), jnp.asarray(x), jnp.asarray(y))
    )[0]
    m = masks[0]
    err = float((m * (warped - frames[1]) ** 2).sum() / max(m.sum(), 1))
    assert err < 5e-4, f"masked warp error {err}"


def test_mask_drops_out_of_frame_content():
    """Strong translation moves content out of frame; those pixels must be
    masked off (the generator crops from a larger canvas, so only genuinely
    unrecoverable content is masked)."""
    b = synthetic_batch(4, hw=(64, 64), n_frames=2, seed=7)
    assert b["masks"].mean() < 1.0  # some occlusion exists across the batch
