"""Per-family eval driver tests (StarGAN v1/v2, CycleGAN dispatch, OBST)."""

import numpy as np
import jax
import jax.numpy as jnp

from vst.data.synthetic import AffineMotionGenerator, _texture
from vst.eval.sintel import SintelVideo
import pytest


def _video(n=7, hw=(32, 32), seed=0):
    rng = np.random.RandomState(seed)
    gen = AffineMotionGenerator(crop_hw=hw, seed=seed + 1)
    frames, _, _ = gen.generate(_texture(rng, (hw[0] + 96, hw[1] + 96)), n)
    return SintelVideo("drv", frames)


def _stub_raft(i1, i2):
    d = jnp.mean(i1 - i2, axis=-1, keepdims=True)
    return None, jnp.concatenate([d, -d], axis=-1)


@pytest.mark.slow
def test_evaluate_sintel_stargan2():
    from vst.train.stargan2 import StarGAN2Config, StarGAN2Trainer
    from vst.eval.drivers import evaluate_sintel_stargan2

    cfg = StarGAN2Config(img_size=32, style_dim=8, latent_dim=4,
                         num_domains=4, max_conv_dim=32)
    tr = StarGAN2Trainer(cfg)
    state = tr.init_state()
    res = evaluate_sintel_stargan2(tr, state.ema | {"generator": state.ema["generator"]},
                                   [_video()], _stub_raft, num_domains=4,
                                   dt_iters=1)
    assert "TCL-ST_mean" in res["TCL-ST"]
    assert "TCL-ST_mean_s3" in res["TCL-ST"]
    for v in res["TCL-ST"].values():
        assert np.isfinite(v)


@pytest.mark.slow
def test_evaluate_sintel_stargan():
    from vst.train.stargan import StarGANConfig, StarGANTrainer
    from vst.models.stargan import Discriminator
    from vst.eval.drivers import evaluate_sintel_stargan

    cfg = StarGANConfig(c_dim=4, image_size=32, conv_dim=8, repeat_num=2)
    tr = StarGANTrainer(cfg)
    tr.D = Discriminator(32, 8, 4, 4)
    state = tr.init_state()
    res = evaluate_sintel_stargan(tr, state.g_params, [_video()], _stub_raft,
                                  c_dim=4, dt_iters=1)
    assert "TCL-ST_mean" in res["TCL-ST"]


def test_cyclegan_stylize_dispatch():
    from vst.train.cyclegan import CycleGANConfig, CycleGANTrainer
    from vst.models.cyclegan import ResnetGenerator
    from vst.eval.drivers import cyclegan_stylize_fn

    pairs = []
    for sid in range(2):
        tr = CycleGANTrainer(CycleGANConfig(ngf=8, ndf=8), image_hw=(32, 32))
        tr.G_A = ResnetGenerator(3, 8, 1)
        tr.G_B = ResnetGenerator(3, 8, 1)
        state = tr.init_state(seed=sid)
        pairs.append((tr, state.params))

    fn = cyclegan_stylize_fn(pairs)
    x = jnp.asarray(
        np.random.RandomState(0).rand(1, 32, 32, 3).astype(np.float32) * 2 - 1
    )
    y0 = fn(x, jnp.asarray(0))
    y1 = fn(x, jnp.asarray(1))
    assert y0.shape == (1, 32, 32, 3)
    assert not np.allclose(np.asarray(y0), np.asarray(y1))
