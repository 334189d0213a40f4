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


def test_pairwise_flows_consistent_with_generate():
    """pairwise_flows(k−1, k) must reproduce generate()'s per-step backward
    flow, and a composed (0→2) warp must align frame2 to frame0 where the
    motion is in-bounds."""
    import numpy as np
    from vst.data.synthetic import AffineMotionGenerator, _texture

    rng = np.random.RandomState(0)
    gen = AffineMotionGenerator(crop_hw=(64, 96), seed=3)
    frames, flows, masks = gen.generate(_texture(rng, (160, 192)), n_frames=4)

    for k in range(1, 4):
        ff, bf = gen.pairwise_flows(k - 1, k)
        np.testing.assert_allclose(bf, flows[k - 1], atol=1e-4)

    # composed far pair: backward-warp frame2 onto frame0's grid with the
    # analytic flow (vst.ops.sample.warp) and check masked agreement
    import jax.numpy as jnp
    from vst.ops.sample import warp
    from vst.ops.flowtools import fbc_mask

    ff, bf = gen.pairwise_flows(0, 2)
    # bf = flow frame2→frame0: warps the EARLIER frame onto frame2's grid
    # (the TCL convention, utils/sintel_eval.py:104-110)
    w = np.asarray(warp(jnp.asarray(frames[0:1]), jnp.asarray(bf)[None]))[0]
    m = np.asarray(fbc_mask(jnp.asarray(ff)[None], jnp.asarray(bf)[None]))[0]
    if m.sum() > 100:  # enough consistent pixels to measure
        err = np.abs((w - frames[2]) * m).sum() / (m.sum() * 3)
        # vst.ops.warp keeps the reference's flowtools quirk (×W/(W−1),
        # −0.5 shift) so even exact flow leaves a resampling floor;
        # the warp must still clearly beat not warping at all
        err0 = np.abs((frames[2] - frames[0]) * m).sum() / (m.sum() * 3)
        assert err < 0.6 * err0, (err, err0)
