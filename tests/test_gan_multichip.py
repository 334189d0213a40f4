"""Multi-chip correctness for the GAN family (VERDICT r2 missing #4).

Sharded-vs-single-device parity on the 8-device CPU mesh for the three GAN
trainers' jitted steps. The constructs that silently diverge under GSPMD
are exactly the gradient-penalty terms: WGAN-GP's per-example grad norm
(StarGAN/solver.py:187-199) and StarGAN-v2's R1 grad-of-grad
(StarGANv2Adv/core/solver.py:465-475) must use GLOBAL batch statistics —
a per-shard mean would change the penalty whenever shard batch ≠ global
batch. The tests run the SAME pure jitted step once on one device and once
with the batch sharded over the mesh's data axis, and assert the penalty
losses agree to fp tolerance and parameters match element-wise up to the
Adam step-1 sign-flip budget (see test_train_faststyle.py for the
derivation of that budget: reduction-order non-associativity on ~0
gradients flips g/(√v̂+ε) to ±lr on isolated elements).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from vst.parallel.mesh import create_mesh, replicate, shard_batch


def _params_close(t1, t2, lr, flip_budget=0.002):
    l1 = jax.tree_util.tree_leaves(t1)
    l2 = jax.tree_util.tree_leaves(t2)
    n_bad = n_tot = 0
    for a, b in zip(l1, l2):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        close = np.isclose(a, b, rtol=5e-3, atol=2e-4)
        n_bad += (~close).sum()
        n_tot += close.size
        assert np.abs(a - b).max() <= 2 * lr + 1e-6
    assert n_bad / n_tot <= flip_budget, f"{n_bad}/{n_tot} elements differ"


def _rand(seed, *shape):
    return jnp.asarray(
        np.random.RandomState(seed).rand(*shape).astype(np.float32) * 2 - 1)


@pytest.mark.slow
def test_cyclegan_dp_step_matches_single_device():
    from vst.models.cyclegan import ResnetGenerator
    from vst.train.cyclegan import CycleGANConfig, CycleGANTrainer

    cfg = CycleGANConfig(variant="cyclegan", netG="resnet_9blocks",
                         ngf=8, ndf=8, pool_size=8, steps_per_epoch=10)
    tr = CycleGANTrainer(cfg, image_hw=(32, 32))
    tr.G_A = ResnetGenerator(3, 8, 2)
    tr.G_B = ResnetGenerator(3, 8, 2)
    batch = {"real_A": _rand(0, 8, 32, 32, 3), "real_B": _rand(1, 8, 32, 32, 3)}
    step = tr.train_step()
    rng = jax.random.PRNGKey(0)

    state1, m1 = step(tr.init_state(0), batch, rng)

    mesh = create_mesh()
    state_r = replicate(tr.init_state(0), mesh)
    batch_s = shard_batch(batch, mesh)
    state2, m2 = step(state_r, batch_s, rng)

    for k in ("G", "D_A", "D_B", "cycle_A"):
        np.testing.assert_allclose(float(m1[k]), float(m2[k]), rtol=2e-4,
                                   err_msg=k)
    _params_close(state1.params, state2.params, lr=cfg.lr)


@pytest.mark.slow
def test_stargan_wgan_gp_dp_step_matches_single_device():
    """WGAN-GP: the per-example interpolate + grad-norm penalty must reduce
    over the GLOBAL batch under sharding (StarGAN/solver.py:187-199)."""
    from vst.models.stargan import Discriminator
    from vst.train.stargan import StarGANConfig, StarGANTrainer

    cfg = StarGANConfig(c_dim=3, image_size=32, conv_dim=8, repeat_num=2)
    tr = StarGANTrainer(cfg)
    # repeat_num 6 on 32px collapses spatial dims; shallower D
    tr.D = Discriminator(image_size=32, conv_dim=8, c_dim=3, repeat_num=4)
    x = _rand(2, 8, 32, 32, 3)
    c_org = jnp.eye(3)[jnp.asarray([0, 1, 2, 0, 1, 2, 0, 1])]
    c_trg = jnp.eye(3)[jnp.asarray([1, 2, 0, 2, 0, 1, 2, 0])]
    rng = jax.random.PRNGKey(3)
    d_step = tr.d_step()

    s1, m1 = d_step(tr.init_state(0), x, c_org, c_trg, rng)

    mesh = create_mesh()
    state_r = replicate(tr.init_state(0), mesh)
    xs, cos, cts = (shard_batch({"x": x, "co": c_org, "ct": c_trg}, mesh)[k]
                    for k in ("x", "co", "ct"))
    s2, m2 = d_step(state_r, xs, cos, cts, rng)

    # the GP term itself must be the global-batch expectation
    np.testing.assert_allclose(float(m1["D/loss_gp"]), float(m2["D/loss_gp"]),
                               rtol=2e-4)
    for k in ("D/loss_real", "D/loss_fake", "D/loss_cls"):
        np.testing.assert_allclose(float(m1[k]), float(m2[k]), rtol=2e-4,
                                   err_msg=k)
    _params_close(s1.d_params, s2.d_params, lr=cfg.d_lr)

    # G step on the updated (single-device) state, sharded vs not
    g_step = tr.g_step()
    g1, mg1 = g_step(s1, x, c_org, c_trg)
    g2, mg2 = g_step(s2, xs, cos, cts)
    np.testing.assert_allclose(float(mg1["G/loss_fake"]),
                               float(mg2["G/loss_fake"]), rtol=2e-4)
    _params_close(g1.g_params, g2.g_params, lr=cfg.g_lr)


@pytest.mark.slow
def test_stargan2_r1_dp_step_matches_single_device():
    """R1 grad-of-grad (core/solver.py:465-475): E[‖∇ₓD‖²] over the global
    batch; plus one G step (adv+sty+cyc through G, F, E)."""
    from vst.train.stargan2 import StarGAN2Config, StarGAN2Trainer

    cfg = StarGAN2Config(img_size=32, style_dim=8, latent_dim=4,
                         num_domains=3, max_conv_dim=32)
    tr = StarGAN2Trainer(cfg)
    x = _rand(4, 8, 32, 32, 3)
    x_ref = _rand(5, 8, 32, 32, 3)
    y_org = jnp.asarray([0, 1, 2, 0, 1, 2, 0, 1])
    y_trg = jnp.asarray([1, 2, 0, 2, 0, 1, 2, 0])
    z = jnp.asarray(np.random.RandomState(6).randn(8, 4).astype(np.float32))
    d_step = tr.d_step("latent")

    s1, m1 = d_step(tr.init_state(0), x, y_org, y_trg, z, x_ref)

    mesh = create_mesh()
    state_r = replicate(tr.init_state(0), mesh)
    sb = shard_batch({"x": x, "xr": x_ref, "yo": y_org, "yt": y_trg,
                      "z": z}, mesh)
    s2, m2 = d_step(state_r, sb["x"], sb["yo"], sb["yt"], sb["z"], sb["xr"])

    np.testing.assert_allclose(float(m1["reg"]), float(m2["reg"]), rtol=2e-4)
    for k in ("real", "fake"):
        np.testing.assert_allclose(float(m1[k]), float(m2[k]), rtol=2e-4,
                                   err_msg=k)
    _params_close(s1.params["disc"], s2.params["disc"], lr=cfg.lr)

    g_step = tr.g_step("latent", True)
    batch1 = {"x_real": x, "x_ref": x_ref, "y_org": y_org,
              "y_trg": y_trg, "z": z}
    g1, mg1 = g_step(s1, batch1)
    batch2 = {k: shard_batch({k: v}, mesh)[k] for k, v in batch1.items()}
    g2, mg2 = g_step(s2, batch2)
    np.testing.assert_allclose(float(mg1["adv"]), float(mg2["adv"]),
                               rtol=2e-4)
    _params_close(g1.params["generator"], g2.params["generator"], lr=cfg.lr)


@pytest.mark.slow
def test_stargan2_bf16_policy_step_close_to_f32():
    """compute_dtype='bfloat16' (vst/train/policy.py): master params f32,
    conv path bf16, loss reductions f32 — the first D and G steps must land
    near the f32 steps (bf16 matmul noise only)."""
    from vst.train.stargan2 import StarGAN2Config, StarGAN2Trainer

    kw = dict(img_size=32, style_dim=8, latent_dim=4, num_domains=3,
              max_conv_dim=32, lambda_tcl=100.0)
    x = _rand(4, 4, 32, 32, 3)
    batch = {
        "x_real": x, "x_real2": _rand(5, 4, 32, 32, 3),
        "x_ref": _rand(6, 4, 32, 32, 3),
        "y_org": jnp.asarray([0, 1, 2, 0]), "y_trg": jnp.asarray([1, 2, 0, 2]),
        "mask": jnp.ones((4, 32, 32, 1)), "flow": jnp.zeros((4, 32, 32, 2)),
    }
    results = {}
    for name, cdt in (("f32", None), ("bf16", "bfloat16")):
        tr = StarGAN2Trainer(StarGAN2Config(compute_dtype=cdt, **kw))
        state = tr.init_state(0)
        state, m = tr.train_iteration(state, batch, jax.random.PRNGKey(0))
        results[name] = {k: float(v) for k, v in m.items()}
        assert all(np.isfinite(v) for v in results[name].values())
    for k in ("D/latent_real", "D/latent_reg", "G/latent_adv",
              "G/latent_cyc", "G/latent_tcl"):
        a, b = results["f32"][k], results["bf16"][k]
        assert abs(a - b) <= 0.05 * (abs(a) + 0.05), (k, a, b)


@pytest.mark.slow
def test_cyclegan_bf16_policy_step_close_to_f32():
    from vst.models.cyclegan import ResnetGenerator
    from vst.train.cyclegan import CycleGANConfig, CycleGANTrainer

    batch = {"real_A": _rand(7, 4, 32, 32, 3), "real_B": _rand(8, 4, 32, 32, 3)}
    results = {}
    for name, cdt in (("f32", None), ("bf16", "bfloat16")):
        cfg = CycleGANConfig(variant="cyclegan", ngf=8, ndf=8, pool_size=4,
                             steps_per_epoch=10, compute_dtype=cdt)
        tr = CycleGANTrainer(cfg, image_hw=(32, 32))
        tr.G_A = ResnetGenerator(3, 8, 2)
        tr.G_B = ResnetGenerator(3, 8, 2)
        state = tr.init_state(0)
        state, m = tr.train_step()(state, batch, jax.random.PRNGKey(0))
        results[name] = {k: float(v) for k, v in m.items()}
        assert all(np.isfinite(v) for v in results[name].values())
    for k in ("G", "cycle_A", "cycle_B", "D_A", "D_B"):
        a, b = results["f32"][k], results["bf16"][k]
        assert abs(a - b) <= 0.05 * (abs(a) + 0.05), (k, a, b)
