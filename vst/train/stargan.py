"""StarGAN v1 solver — parity with ``StarGAN/solver.py:241-412``.

WGAN adversarial losses (−E[D(real)] + E[D(fake)]), multi-label BCE domain
classification (CelebA-mode: sum/B, solver.py:241-246), WGAN-GP on
interpolates (λ_gp=10, :187-199), reconstruction L1 (λ_rec=10), n_critic=5
(G stepped every 5th iteration), Adam(1e-4, β=(0.5, 0.999)), linear LR decay
over the last num_iters_decay iterations stepped every 1000 iters.

TPU-native: two jitted steps (d_step every iter, g_step every n_critic-th —
host-level scheduling like the reference's modulo), grad-of-grad for the
penalty inside jit.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp
import optax
import flax.struct

from vst.models.stargan import Generator, Discriminator


def stargan_lr_schedule(lr0: float, num_iters: int = 200_000,
                        num_iters_decay: int = 100_000,
                        lr_update_step: int = 1000):
    """solver.py:404-409: every 1000 iters in the decay phase subtract
    lr0/num_iters_decay."""

    def schedule(count):
        decayed_updates = jnp.maximum(
            0, (count + 1 - (num_iters - num_iters_decay)) // lr_update_step
        )
        lr = lr0 - decayed_updates * (lr0 / num_iters_decay) * lr_update_step
        return jnp.maximum(lr, 0.0)

    return schedule


@dataclasses.dataclass
class StarGANConfig:
    c_dim: int = 4
    image_size: int = 128
    conv_dim: int = 64
    repeat_num: int = 6
    lambda_cls: float = 1.0
    lambda_rec: float = 10.0
    lambda_gp: float = 10.0
    n_critic: int = 5
    g_lr: float = 1e-4
    d_lr: float = 1e-4
    beta1: float = 0.5
    beta2: float = 0.999
    num_iters: int = 200_000
    num_iters_decay: int = 100_000


class StarGANState(flax.struct.PyTreeNode):
    step: jnp.ndarray
    g_params: Any
    d_params: Any
    opt_g: Any
    opt_d: Any


def classification_loss_bce(logits, targets):
    """BCEWithLogits(size_average=False)/B (solver.py:241-246, CelebA mode —
    the thesis trains FC2 styled-files with one-hot labels through this)."""
    per = (
        jnp.maximum(logits, 0)
        - logits * targets
        + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )
    return jnp.sum(per) / logits.shape[0]


class StarGANTrainer:
    def __init__(self, cfg: StarGANConfig, seed: int = 0):
        self.cfg = cfg
        self.G = Generator(cfg.conv_dim, cfg.c_dim, cfg.repeat_num)
        self.D = Discriminator(cfg.image_size, cfg.conv_dim, cfg.c_dim,
                               cfg.repeat_num)
        self.tx_g = optax.adam(
            stargan_lr_schedule(cfg.g_lr, cfg.num_iters, cfg.num_iters_decay),
            b1=cfg.beta1, b2=cfg.beta2,
        )
        self.tx_d = optax.adam(
            stargan_lr_schedule(cfg.d_lr, cfg.num_iters, cfg.num_iters_decay),
            b1=cfg.beta1, b2=cfg.beta2,
        )
        self._d_step = None
        self._g_step = None

    def init_state(self, seed: int = 0) -> StarGANState:
        H = self.cfg.image_size
        img = jnp.zeros((1, H, H, 3), jnp.float32)
        lbl = jnp.zeros((1, self.cfg.c_dim), jnp.float32)
        k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
        g_params = self.G.init(k1, img, lbl)["params"]
        d_params = self.D.init(k2, img)["params"]
        return StarGANState(
            step=jnp.zeros((), jnp.int32),
            g_params=g_params, d_params=d_params,
            opt_g=self.tx_g.init(g_params), opt_d=self.tx_d.init(d_params),
        )

    def _gp(self, d_params, x_hat):
        """solver.py:187-199: (‖∇ₓ out_src‖₂ − 1)² mean."""

        def src_sum(x):
            out_src, _ = self.D.apply({"params": d_params}, x)
            return jnp.sum(out_src)

        g = jax.grad(src_sum)(x_hat)
        g = g.reshape(x_hat.shape[0], -1)
        # tiny floor guards the sqrt subgradient if D's input-gradient is
        # exactly 0 (same NaN class as the TV loss; values unchanged)
        norm = jnp.sqrt(jnp.maximum(jnp.sum(g ** 2, axis=1), 1e-24))
        return jnp.mean((norm - 1.0) ** 2)

    def d_step(self):
        if self._d_step is not None:
            return self._d_step
        cfg = self.cfg

        def loss_fn(d_params, g_params, x_real, c_org, c_trg, rng):
            out_src, out_cls = self.D.apply({"params": d_params}, x_real)
            d_loss_real = -jnp.mean(out_src)
            d_loss_cls = classification_loss_bce(out_cls, c_org)

            x_fake = jax.lax.stop_gradient(
                self.G.apply({"params": g_params}, x_real, c_trg)
            )
            out_src_f, _ = self.D.apply({"params": d_params}, x_fake)
            d_loss_fake = jnp.mean(out_src_f)

            alpha = jax.random.uniform(rng, (x_real.shape[0], 1, 1, 1))
            x_hat = alpha * x_real + (1 - alpha) * x_fake
            d_loss_gp = self._gp(d_params, x_hat)

            loss = (d_loss_real + d_loss_fake + cfg.lambda_cls * d_loss_cls
                    + cfg.lambda_gp * d_loss_gp)
            return loss, {"D/loss_real": d_loss_real, "D/loss_fake": d_loss_fake,
                          "D/loss_cls": d_loss_cls, "D/loss_gp": d_loss_gp}

        def step(state: StarGANState, x_real, c_org, c_trg, rng):
            (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.d_params, state.g_params, x_real, c_org, c_trg, rng
            )
            updates, opt_d = self.tx_d.update(grads, state.opt_d, state.d_params)
            d_params = optax.apply_updates(state.d_params, updates)
            return state.replace(step=state.step + 1, d_params=d_params,
                                 opt_d=opt_d), metrics

        self._d_step = jax.jit(step, donate_argnums=(0,))
        return self._d_step

    def g_step(self):
        if self._g_step is not None:
            return self._g_step
        cfg = self.cfg

        def loss_fn(g_params, d_params, x_real, c_org, c_trg):
            x_fake = self.G.apply({"params": g_params}, x_real, c_trg)
            out_src, out_cls = self.D.apply({"params": d_params}, x_fake)
            g_loss_fake = -jnp.mean(out_src)
            g_loss_cls = classification_loss_bce(out_cls, c_trg)
            x_rec = self.G.apply({"params": g_params}, x_fake, c_org)
            g_loss_rec = jnp.mean(jnp.abs(x_real - x_rec))
            loss = g_loss_fake + cfg.lambda_rec * g_loss_rec + cfg.lambda_cls * g_loss_cls
            return loss, {"G/loss_fake": g_loss_fake, "G/loss_rec": g_loss_rec,
                          "G/loss_cls": g_loss_cls}

        def step(state: StarGANState, x_real, c_org, c_trg):
            (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.g_params, state.d_params, x_real, c_org, c_trg
            )
            updates, opt_g = self.tx_g.update(grads, state.opt_g, state.g_params)
            g_params = optax.apply_updates(state.g_params, updates)
            return state.replace(g_params=g_params, opt_g=opt_g), metrics

        self._g_step = jax.jit(step, donate_argnums=(0,))
        return self._g_step

    def generate_fn(self):
        def fn(g_params, x, c):
            return self.G.apply({"params": g_params}, x, c)

        return jax.jit(fn)
