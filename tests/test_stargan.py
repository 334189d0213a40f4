"""StarGAN v1/v2 model + solver tests (tiny configs)."""

import pytest
import numpy as np
import jax
import jax.numpy as jnp

from vst.models.stargan import Generator as G1, Discriminator as D1
from vst.models.stargan2 import (
    Generator as G2, MappingNetwork, StyleEncoder, Discriminator as D2, ResBlk,
)
from vst.train.stargan import (
    StarGANConfig, StarGANTrainer, stargan_lr_schedule, classification_loss_bce,
)
from vst.train.stargan2 import StarGAN2Config, StarGAN2Trainer, adv_loss


@pytest.mark.slow
def test_stargan1_generator_shapes():
    g = G1(conv_dim=8, c_dim=4, repeat_num=2)
    x = jnp.zeros((2, 32, 32, 3))
    c = jax.nn.one_hot(jnp.asarray([0, 2]), 4)
    params = g.init(jax.random.PRNGKey(0), x, c)
    y = g.apply(params, x, c)
    assert y.shape == (2, 32, 32, 3)
    assert float(jnp.abs(y).max()) <= 1.0


@pytest.mark.slow
def test_stargan1_discriminator_heads():
    d = D1(image_size=64, conv_dim=8, c_dim=4, repeat_num=6)
    x = jnp.zeros((2, 64, 64, 3))
    params = d.init(jax.random.PRNGKey(0), x)
    src, cls = d.apply(params, x)
    assert src.shape == (2, 1, 1, 1)
    assert cls.shape == (2, 4)


def test_stargan1_classification_loss_matches_torch():
    import torch

    logits = np.random.RandomState(0).randn(4, 4).astype(np.float32)
    targets = np.eye(4, dtype=np.float32)
    got = float(classification_loss_bce(jnp.asarray(logits), jnp.asarray(targets)))
    want = (
        torch.nn.functional.binary_cross_entropy_with_logits(
            torch.from_numpy(logits), torch.from_numpy(targets), reduction="sum"
        )
        / 4
    ).item()
    np.testing.assert_allclose(got, want, rtol=1e-5)


@pytest.mark.slow
def test_stargan1_training_steps():
    cfg = StarGANConfig(c_dim=3, image_size=32, conv_dim=8, repeat_num=6,
                        n_critic=2)
    tr = StarGANTrainer(cfg)
    # repeat_num 6 on 32px collapses spatial dims; use a D with fewer layers
    from vst.models.stargan import Discriminator

    tr.D = Discriminator(image_size=32, conv_dim=8, c_dim=3, repeat_num=4)
    state = tr.init_state()
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(2, 32, 32, 3).astype(np.float32) * 2 - 1)
    c_org = jax.nn.one_hot(jnp.asarray([0, 1]), 3)
    c_trg = jax.nn.one_hot(jnp.asarray([2, 0]), 3)
    d = tr.d_step()
    g = tr.g_step()
    for i in range(2):
        state, dm = d(state, x, c_org, c_trg, jax.random.PRNGKey(i))
    state, gm = g(state, x, c_org, c_trg)
    for k in ("D/loss_real", "D/loss_fake", "D/loss_cls", "D/loss_gp"):
        assert np.isfinite(float(dm[k])), k
    for k in ("G/loss_fake", "G/loss_rec", "G/loss_cls"):
        assert np.isfinite(float(gm[k])), k


def test_stargan_lr_schedule():
    sched = stargan_lr_schedule(1e-4, num_iters=2000, num_iters_decay=1000,
                                lr_update_step=100)
    np.testing.assert_allclose(float(sched(0)), 1e-4, rtol=1e-5)
    np.testing.assert_allclose(float(sched(999)), 1e-4, rtol=1e-5)
    # after first decay step in the decay phase
    assert float(sched(1100)) < 1e-4
    assert float(sched(1999)) >= 0.0


@pytest.mark.slow
def test_resblk_unit_variance_scaling():
    blk = ResBlk(dim_out=8, normalize=True, downsample=True)
    x = jnp.asarray(np.random.RandomState(1).randn(2, 16, 16, 4).astype(np.float32))
    params = blk.init(jax.random.PRNGKey(0), x)
    y = blk.apply(params, x)
    assert y.shape == (2, 8, 8, 8)


@pytest.mark.slow
def test_stargan2_nets_shapes():
    cfg = dict(img_size=32, style_dim=8, num_domains=3)
    g = G2(img_size=32, style_dim=8, max_conv_dim=32)
    f = MappingNetwork(latent_dim=4, style_dim=8, num_domains=3)
    e = StyleEncoder(img_size=32, style_dim=8, num_domains=3, max_conv_dim=32)
    d = D2(img_size=32, num_domains=3, max_conv_dim=32)

    x = jnp.zeros((2, 32, 32, 3))
    z = jnp.zeros((2, 4))
    y = jnp.asarray([0, 2])
    s = f.apply(f.init(jax.random.PRNGKey(0), z, y), z, y)
    assert s.shape == (2, 8)
    out = g.apply(g.init(jax.random.PRNGKey(1), x, s), x, s)
    assert out.shape == (2, 32, 32, 3)
    se = e.apply(e.init(jax.random.PRNGKey(2), x, y), x, y)
    assert se.shape == (2, 8)
    logit = d.apply(d.init(jax.random.PRNGKey(3), x, y), x, y)
    assert logit.shape == (2,)


@pytest.mark.slow
def test_stargan2_full_iteration_and_ema():
    cfg = StarGAN2Config(img_size=32, style_dim=8, latent_dim=4, num_domains=3,
                         max_conv_dim=32, lambda_tcl=0.0)
    tr = StarGAN2Trainer(cfg)
    state = tr.init_state()
    rng = np.random.RandomState(0)
    batch = {
        "x_real": jnp.asarray(rng.rand(2, 32, 32, 3).astype(np.float32) * 2 - 1),
        "x_ref": jnp.asarray(rng.rand(2, 32, 32, 3).astype(np.float32) * 2 - 1),
        "y_org": jnp.asarray([0, 1]),
        "y_trg": jnp.asarray([2, 0]),
    }
    ema_before = jax.tree.leaves(state.ema)[0].copy()
    state, metrics = tr.train_iteration(state, batch, jax.random.PRNGKey(0))
    for k in ("D/latent_real", "D/latent_reg", "G/latent_adv", "G/latent_cyc",
              "G/ref_adv"):
        assert np.isfinite(float(metrics[k])), k
    # EMA moved (β=0.999 lerp toward updated params)
    ema_after = jax.tree.leaves(state.ema)[0]
    assert not np.allclose(np.asarray(ema_before), np.asarray(ema_after))
    assert float(state.lambda_ds) < cfg.lambda_ds
    assert int(state.step) == 1


@pytest.mark.slow
def test_stargan2_advcon_tcl():
    cfg = StarGAN2Config(img_size=32, style_dim=8, latent_dim=4, num_domains=3,
                         max_conv_dim=32, lambda_tcl=100.0)
    tr = StarGAN2Trainer(cfg)
    state = tr.init_state()
    rng = np.random.RandomState(1)
    batch = {
        "x_real": jnp.asarray(rng.rand(2, 32, 32, 3).astype(np.float32) * 2 - 1),
        "x_real2": jnp.asarray(rng.rand(2, 32, 32, 3).astype(np.float32) * 2 - 1),
        "x_ref": jnp.asarray(rng.rand(2, 32, 32, 3).astype(np.float32) * 2 - 1),
        "y_org": jnp.asarray([0, 1]),
        "y_trg": jnp.asarray([2, 0]),
        "mask": jnp.ones((2, 32, 32, 1)),
        "flow": jnp.zeros((2, 32, 32, 2)),
    }
    state, metrics = tr.train_iteration(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["G/latent_tcl"]))
    assert float(metrics["G/latent_tcl"]) > 0


def test_adv_loss_matches_torch_bce():
    import torch

    logits = np.random.RandomState(2).randn(3, 5).astype(np.float32)
    got = float(adv_loss(jnp.asarray(logits), 1))
    want = torch.nn.functional.binary_cross_entropy_with_logits(
        torch.from_numpy(logits), torch.ones(3, 5)
    ).item()
    np.testing.assert_allclose(got, want, rtol=1e-5)


def _fixed_batch32(num_dom=3):
    rng = np.random.RandomState(0)
    return {
        "x_real": jnp.asarray(rng.rand(2, 32, 32, 3).astype(np.float32) * 2 - 1),
        "x_ref": jnp.asarray(rng.rand(2, 32, 32, 3).astype(np.float32) * 2 - 1),
        "y_org": jnp.asarray([0, 1]),
        "y_trg": jnp.asarray([2, 0]),
    }




@pytest.mark.slow
def test_stargan1_reconstruction_descends():
    """30 fixed-batch alternating steps: the cycle-reconstruction loss (the
    supervised term of solver.py:241-412's objective) must decrease."""
    cfg = StarGANConfig(c_dim=3, image_size=32, conv_dim=8, repeat_num=6,
                        n_critic=1)
    tr = StarGANTrainer(cfg)
    from vst.models.stargan import Discriminator

    tr.D = Discriminator(image_size=32, conv_dim=8, c_dim=3, repeat_num=4)
    state = tr.init_state()
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(2, 32, 32, 3).astype(np.float32) * 2 - 1)
    c_org = jax.nn.one_hot(jnp.asarray([0, 1]), 3)
    c_trg = jax.nn.one_hot(jnp.asarray([2, 0]), 3)
    d, g = tr.d_step(), tr.g_step()
    rec = []
    for i in range(30):
        state, _ = d(state, x, c_org, c_trg, jax.random.PRNGKey(i))
        state, gm = g(state, x, c_org, c_trg)
        rec.append(float(gm["G/loss_rec"]))
    assert np.isfinite(rec).all()
    assert np.mean(rec[-5:]) < np.mean(rec[:5]), (rec[:5], rec[-5:])


@pytest.mark.slow
def test_stargan2_style_and_cycle_descend():
    """30 fixed-batch iterations of the full v2 solver: style-reconstruction
    + cycle (the supervised terms, core/solver.py:404-449) must decrease."""
    cfg = StarGAN2Config(img_size=32, style_dim=8, latent_dim=4, num_domains=3,
                         max_conv_dim=32, lambda_tcl=0.0)
    tr = StarGAN2Trainer(cfg)
    state = tr.init_state()
    batch = _fixed_batch32()
    rec = []
    for i in range(30):
        state, m = tr.train_iteration(state, batch, jax.random.PRNGKey(i))
        rec.append(float(m["G/latent_sty"]) + float(m["G/latent_cyc"]))
    assert np.isfinite(rec).all()
    assert np.mean(rec[-5:]) < np.mean(rec[:5]), (rec[:5], rec[-5:])
