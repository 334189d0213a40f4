"""Parity tests: vst.ops.image vs torch pad/interpolate/pool."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F
import jax.numpy as jnp

from vst.ops.image import (
    reflect_pad,
    replicate_pad,
    resize_nearest,
    resize_bilinear,
    avg_pool2d,
    InputPadder,
)


def _rand(*shape, seed=0):
    rng = np.random.RandomState(seed)
    return rng.randn(*shape).astype(np.float32)


def test_reflect_pad():
    x = _rand(2, 6, 7, 3, seed=1)
    got = reflect_pad(jnp.asarray(x), 2)
    want = F.pad(torch.from_numpy(x).permute(0, 3, 1, 2), (2, 2, 2, 2), mode="reflect")
    np.testing.assert_allclose(np.asarray(got), want.permute(0, 2, 3, 1).numpy())


def test_replicate_pad():
    x = _rand(1, 5, 5, 2, seed=2)
    got = replicate_pad(jnp.asarray(x), (1, 2, 3, 0))
    want = F.pad(torch.from_numpy(x).permute(0, 3, 1, 2), (1, 2, 3, 0), mode="replicate")
    np.testing.assert_allclose(np.asarray(got), want.permute(0, 2, 3, 1).numpy())


def test_resize_nearest_2x():
    x = _rand(2, 4, 5, 3, seed=3)
    got = resize_nearest(jnp.asarray(x), 2)
    want = F.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2), scale_factor=2)
    np.testing.assert_allclose(np.asarray(got), want.permute(0, 2, 3, 1).numpy())


@pytest.mark.parametrize("align_corners", [True, False])
@pytest.mark.parametrize("out_hw", [(16, 24), (7, 5), (9, 9)])
def test_resize_bilinear(align_corners, out_hw):
    x = _rand(2, 8, 12, 2, seed=4)
    got = resize_bilinear(jnp.asarray(x), out_hw, align_corners=align_corners)
    want = F.interpolate(
        torch.from_numpy(x).permute(0, 3, 1, 2),
        size=out_hw,
        mode="bilinear",
        align_corners=align_corners,
    )
    np.testing.assert_allclose(
        np.asarray(got), want.permute(0, 2, 3, 1).numpy(), rtol=1e-5, atol=1e-5
    )


def test_avg_pool2d():
    x = _rand(2, 8, 10, 4, seed=5)
    got = avg_pool2d(jnp.asarray(x), 2, 2)
    want = F.avg_pool2d(torch.from_numpy(x).permute(0, 3, 1, 2), 2, stride=2)
    np.testing.assert_allclose(
        np.asarray(got), want.permute(0, 2, 3, 1).numpy(), rtol=1e-5, atol=1e-6
    )


@pytest.mark.parametrize("mode", ["sintel", "other"])
@pytest.mark.parametrize("hw", [(436, 1024), (100, 200), (96, 128)])
def test_input_padder_roundtrip(mode, hw):
    x = _rand(1, hw[0], hw[1], 3, seed=6)
    padder = InputPadder(x.shape, mode=mode)
    (padded,) = padder.pad(jnp.asarray(x))
    assert padded.shape[1] % 8 == 0 and padded.shape[2] % 8 == 0
    unpadded = padder.unpad(padded)
    np.testing.assert_allclose(np.asarray(unpadded), x)


def test_input_padder_mult64():
    # perf option: mult=64 aligns every 1/8..1/64 pyramid level to the
    # 8-sublane tiling; default mult=8 stays reference-parity
    x = _rand(1, 436, 1024, 3, seed=7)
    p = InputPadder(x.shape, mult=64)
    (padded,) = p.pad(jnp.asarray(x))
    assert padded.shape == (1, 448, 1024, 3)
    np.testing.assert_allclose(np.asarray(p.unpad(padded)), x)
    # interior values are the original image under the centered pad
    assert InputPadder(x.shape).pad(jnp.asarray(x))[0].shape == (1, 440, 1024, 3)
    # already-aligned input is untouched
    z = jnp.zeros((1, 448, 1024, 3))
    assert InputPadder(z.shape, mult=64).pad(z)[0].shape == z.shape
