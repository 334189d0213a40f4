"""CycleGAN-family training — pure jitted G/D steps.

TPU-native re-derivation of the imperative junyanz training semantics
(``CycleGAN/models/cycle_gan_model.py:235-252``, SURVEY.md §7 hard part #3):

* fakes are computed ONCE per iteration; the G step uses the current D, the
  D step uses pool-replayed fakes from the PRE-update G (the reference
  stores ``self.fake_B`` in forward, steps G, then queries the pool);
* "detach fakes for D" ⇒ ``stop_gradient`` on pool outputs;
* "set_requires_grad toggling" ⇒ gradients taken only w.r.t. the stepped
  subset of params (jax.grad argument selection), no mutation.

Variants:
* ``cyclegan``   — stock losses (cycle_gan_model.py:205-233);
* ``cyclegan_con`` — + supervised temporal loss on pseudo-paired frames
  ``λ_T·mean((mask·(G_A(A2) − warp(G_A(A), flow)))²)``, λ_T=10
  (CycleGANCon/models/cycle_gan_model.py:190-204);
* ``mogan``      — Mocycle-GAN: motion translators M_A/M_B (2ch resnet
  generators), RAFT inside the forward on real/fake/rec pairs, MC/MT losses
  in the G step and an alternating AM step for the M nets
  (MoGAN/models/cycle_gan_model.py:160-335).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import optax
import flax.struct

from vst.models.cyclegan import (
    define_G,
    define_D,
    gan_loss,
    image_pool_init,
    image_pool_query,
)
from vst.ops.sample import warp
from vst.train.policy import cast_img, cast_tree, compute_dtype_of, f32
from vst.ops.flowtools import fbc_mask
from vst.ops.image import InputPadder


def linear_lr_schedule(lr0: float, steps_per_epoch: int, n_epochs: int = 100,
                       n_epochs_decay: int = 100):
    """junyanz 'linear' policy (networks.py:38-54): flat for n_epochs, then
    linear decay to 0 over n_epochs_decay (stepped per epoch)."""

    def schedule(count):
        epoch = count // steps_per_epoch
        factor = 1.0 - jnp.maximum(0.0, epoch + 1.0 - n_epochs) / (n_epochs_decay + 1.0)
        return lr0 * jnp.clip(factor, 0.0, 1.0)

    return schedule


@dataclasses.dataclass
class CycleGANConfig:
    variant: str = "cyclegan"  # cyclegan | cyclegan_con | mogan | congan
    lambda_A: float = 10.0
    lambda_B: float = 10.0
    lambda_identity: float = 0.5
    lambda_T: float = 10.0    # con temporal
    lambda_MC: float = 10.0   # mogan motion cycle
    lambda_MT: float = 10.0   # mogan motion translation
    lambda_AM: float = 1.0    # mogan auxiliary motion
    lambda_TCL: float = 10.0  # congan fused temporal (A-side only)
    lambda_c3D: float = 10.0  # congan cross-frame 3D cycle
    gan_mode: str = "lsgan"
    lr: float = 2e-4
    beta1: float = 0.5
    pool_size: int = 50
    steps_per_epoch: int = 1000
    n_epochs: int = 100
    n_epochs_decay: int = 100
    netG: str = "resnet_9blocks"
    netD: str = "basic"
    ngf: int = 64
    ndf: int = 64
    raft_iters: int = 20  # mogan in-training flow
    # optional bf16 compute policy (vst/train/policy.py): master params
    # and the RAFT instrument stay f32; "bfloat16" runs the G/D conv
    # path on the MXU at native rate. None = reference-parity f32.
    compute_dtype: Optional[str] = None


class CycleGANState(flax.struct.PyTreeNode):
    step: jnp.ndarray
    params: Dict[str, Any]
    opt_g: Any
    opt_d: Any
    opt_m: Any
    pool_a: Any
    pool_b: Any


class CycleGANTrainer:
    def __init__(self, cfg: CycleGANConfig, image_hw=(256, 256),
                 raft_apply: Optional[Callable] = None, seed: int = 0):
        self.cfg = cfg
        self.G_A = define_G(cfg.netG, 3, cfg.ngf)
        self.G_B = define_G(cfg.netG, 3, cfg.ngf)
        self.D_A = define_D(cfg.netD, cfg.ndf)
        self.D_B = define_D(cfg.netD, cfg.ndf)
        if cfg.variant == "mogan":
            # 2ch→2ch motion translators (MoGAN cycle_gan_model.py:95-99)
            self.M_A = define_G(cfg.netG, 2, cfg.ngf)
            self.M_B = define_G(cfg.netG, 2, cfg.ngf)
            assert raft_apply is not None, "mogan needs a bound RAFT"
        if cfg.variant == "congan":
            from vst.models.cyclegan import FusionBlock

            self.F_A = FusionBlock()
            self.F_B = FusionBlock()
            assert raft_apply is not None, "congan needs a bound RAFT"
        self.raft_apply = raft_apply
        self.image_hw = image_hw

        sched = linear_lr_schedule(cfg.lr, cfg.steps_per_epoch, cfg.n_epochs,
                                   cfg.n_epochs_decay)
        adam = lambda: optax.adam(sched, b1=cfg.beta1, b2=0.999)
        self.tx_g = adam()
        self.tx_d = adam()
        self.tx_m = adam()
        self._steps = {}

    # -- init ------------------------------------------------------------------

    def init_state(self, seed: int = 0) -> CycleGANState:
        H, W = self.image_hw
        img = jnp.zeros((1, H, W, 3), jnp.float32)
        flow = jnp.zeros((1, H, W, 2), jnp.float32)
        ks = jax.random.split(jax.random.PRNGKey(seed), 6)
        params = {
            "G_A": self.G_A.init(ks[0], img)["params"],
            "G_B": self.G_B.init(ks[1], img)["params"],
            "D_A": self.D_A.init(ks[2], img)["params"],
            "D_B": self.D_B.init(ks[3], img)["params"],
        }
        if self.cfg.variant == "mogan":
            params["M_A"] = self.M_A.init(ks[4], flow)["params"]
            params["M_B"] = self.M_B.init(ks[5], flow)["params"]
        if self.cfg.variant == "congan":
            params["F_A"] = self.F_A.init(ks[4], img, img)["params"]
            params["F_B"] = self.F_B.init(ks[5], img, img)["params"]
        # congan: the fusion nets step together with G off the same backward
        # (ConGAN cycle_gan_model.py:313-316 — optimizer_F.step after
        # backward_G); including F in the G subset is adam-equivalent
        g_sub = {k: v for k, v in params.items()
                 if k.startswith("G") or k.startswith("F")}
        d_sub = {k: v for k, v in params.items() if k.startswith("D")}
        m_sub = {k: v for k, v in params.items() if k.startswith("M")}
        return CycleGANState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_g=self.tx_g.init(g_sub),
            opt_d=self.tx_d.init(d_sub),
            opt_m=self.tx_m.init(m_sub) if m_sub else (),
            pool_a=image_pool_init(self.cfg.pool_size, (H, W, 3)),
            pool_b=image_pool_init(self.cfg.pool_size, (H, W, 3)),
        )

    # -- pieces ------------------------------------------------------------------

    def _g_apply(self, which, params, x):
        mod = getattr(self, which)
        return mod.apply({"params": params[which]}, x)

    def _compute_raft(self, img1, img2):
        """MoGAN computeRAFT: pads to /8, images in [−1,1] fed straight into
        RAFT's own 255-range normalization (same quirk as the eval harness)."""
        padder = InputPadder(img1.shape)
        i1, i2 = padder.pad(f32(img1), f32(img2))
        _, up = self.raft_apply(i1, i2)
        return padder.unpad(up)

    def _g_loss(self, g_params, d_params, batch, aux):
        cfg = self.cfg
        cd = compute_dtype_of(cfg.compute_dtype)
        p = cast_tree({**g_params, **d_params}, cd)
        batch = {k: cast_img(v, cd) if k.startswith("real") else v
                 for k, v in batch.items()}
        d_params = cast_tree(d_params, cd)
        real_A, real_B = batch["real_A"], batch["real_B"]

        fake_B = self._g_apply("G_A", p, real_A)
        rec_A = self._g_apply("G_B", p, fake_B)
        fake_A = self._g_apply("G_B", p, real_B)
        rec_B = self._g_apply("G_A", p, fake_A)

        losses = {}
        if cfg.lambda_identity > 0:
            idt_A = self._g_apply("G_A", p, real_B)
            idt_B = self._g_apply("G_B", p, real_A)
            losses["idt_A"] = jnp.mean(jnp.abs(idt_A - real_B)) * cfg.lambda_B * cfg.lambda_identity
            losses["idt_B"] = jnp.mean(jnp.abs(idt_B - real_A)) * cfg.lambda_A * cfg.lambda_identity
        else:
            losses["idt_A"] = 0.0
            losses["idt_B"] = 0.0

        losses["G_A"] = gan_loss(
            self.D_A.apply({"params": d_params["D_A"]}, fake_B), True, cfg.gan_mode
        )
        losses["G_B"] = gan_loss(
            self.D_B.apply({"params": d_params["D_B"]}, fake_A), True, cfg.gan_mode
        )
        losses["cycle_A"] = jnp.mean(jnp.abs(rec_A - real_A)) * cfg.lambda_A
        losses["cycle_B"] = jnp.mean(jnp.abs(rec_B - real_B)) * cfg.lambda_B

        total = sum(losses.values())

        if cfg.variant == "cyclegan_con":
            # CycleGANCon cycle_gan_model.py:190-204 (inline flowtools-style
            # warp of fake_B with the GT backward flow)
            fake_B2 = self._g_apply("G_A", p, batch["real_A2"])
            wimg1 = warp(fake_B, batch["flow"])
            losses["G_T"] = jnp.mean(
                (batch["mask"] * (fake_B2 - wimg1)) ** 2
            ) * cfg.lambda_T
            total = total + losses["G_T"]

        if cfg.variant == "congan":
            # ConGAN forward_train + backward_G
            # (ConGAN/models/cycle_gan_model.py:160-308). RAFT flows are
            # no_grad in the reference (:128-134) → stop_gradient. The VGG
            # semantic loss is wired but zeroed (:295-296) — we skip the
            # dead compute; the scalar soft mask exp(−50·mean|simg−wimg|)
            # (:136-137) and the zeroed B-side TCL (:299) are kept.
            real_A2, real_B2 = batch["real_A2"], batch["real_B2"]
            fake_B2 = self._g_apply("G_A", p, real_A2)
            fake_A2 = self._g_apply("G_B", p, real_B2)

            sg = jax.lax.stop_gradient
            bf_real_A = sg(self._compute_raft(real_A2, real_A))
            warp_B = warp(fake_B, bf_real_A)
            fuse_B = self.F_A.apply({"params": p["F_A"]}, fake_B2, warp_B)
            mask_A = jnp.exp(-50.0 * jnp.mean(jnp.abs(real_A2 - warp(real_A, bf_real_A))))
            bf_fake_B = sg(self._compute_raft(fuse_B, fake_B))
            rec3D_A2 = self.F_B.apply(
                {"params": p["F_B"]},
                self._g_apply("G_B", p, fuse_B),
                warp(fake_B, bf_fake_B),
            )

            bf_real_B = sg(self._compute_raft(real_B2, real_B))
            warp_A = warp(fake_A, bf_real_B)
            fuse_A = self.F_B.apply({"params": p["F_B"]}, fake_A2, warp_A)
            bf_fake_A = sg(self._compute_raft(fuse_A, fake_A))
            rec3D_B2 = self.F_A.apply(
                {"params": p["F_A"]},
                self._g_apply("G_A", p, fuse_A),
                warp(fake_A, bf_fake_A),
            )

            losses["c3D_A"] = jnp.mean(jnp.abs(rec3D_A2 - real_A2)) * cfg.lambda_c3D
            losses["c3D_B"] = jnp.mean(jnp.abs(rec3D_B2 - real_B2)) * cfg.lambda_c3D
            losses["TCL_A"] = jnp.mean(mask_A * jnp.abs(fuse_B - warp_B)) * cfg.lambda_TCL
            losses["TCL_B"] = jnp.zeros(())  # disabled in the reference (:299)
            total = total + losses["c3D_A"] + losses["c3D_B"] + losses["TCL_A"]

        if cfg.variant == "mogan":
            real_A2, real_B2 = batch["real_A2"], batch["real_B2"]
            fake_B2 = self._g_apply("G_A", p, real_A2)
            rec_A2 = self._g_apply("G_B", p, fake_B2)
            fake_A2 = self._g_apply("G_B", p, real_B2)
            rec_B2 = self._g_apply("G_A", p, fake_A2)

            # ALL RAFT flows are detached: the reference's computeRAFT is
            # wrapped in torch.no_grad() (MoGAN/models/cycle_gan_model.py:
            # 131-137), including the rec-pair flows — so the motion-cycle
            # term MC = mask·|bf_rec − bf_real| carries NO generator
            # gradient there (a conscious parity quirk, kept: it is a
            # logged consistency metric, and dropping the differentiable
            # RAFT backward removes ~8 saved GRU graphs from HBM)
            ff_A = jax.lax.stop_gradient(self._compute_raft(real_A, real_A2))
            bf_A = jax.lax.stop_gradient(self._compute_raft(real_A2, real_A))
            bf_rec_A = jax.lax.stop_gradient(self._compute_raft(rec_A2, rec_A))
            mask_A = jax.lax.stop_gradient(fbc_mask(ff_A, bf_A))
            bf_M_A = jax.lax.stop_gradient(aux["bf_M_A"])
            warp_B = warp(fake_B, bf_M_A)

            ff_B = jax.lax.stop_gradient(self._compute_raft(real_B, real_B2))
            bf_B = jax.lax.stop_gradient(self._compute_raft(real_B2, real_B))
            bf_rec_B = jax.lax.stop_gradient(self._compute_raft(rec_B2, rec_B))
            mask_B = jax.lax.stop_gradient(fbc_mask(ff_B, bf_B))
            bf_M_B = jax.lax.stop_gradient(aux["bf_M_B"])
            warp_A = warp(fake_A, bf_M_B)

            losses["MC_A"] = jnp.mean(mask_A * jnp.abs(bf_rec_A - bf_A)) * cfg.lambda_MC
            losses["MC_B"] = jnp.mean(mask_B * jnp.abs(bf_rec_B - bf_B)) * cfg.lambda_MC
            losses["MT_A"] = jnp.mean(mask_A * jnp.abs(warp_B - fake_B2)) * cfg.lambda_MT
            losses["MT_B"] = jnp.mean(mask_B * jnp.abs(warp_A - fake_A2)) * cfg.lambda_MT
            total = total + losses["MC_A"] + losses["MC_B"] + losses["MT_A"] + losses["MT_B"]

        losses["G"] = total
        return total, (losses, fake_A, fake_B)

    def _d_loss(self, d_params, batch, fake_A, fake_B):
        cfg = self.cfg
        cd = compute_dtype_of(cfg.compute_dtype)
        d_params = cast_tree(d_params, cd)
        batch = {k: cast_img(v, cd) if k.startswith("real") else v
                 for k, v in batch.items()}
        fake_A, fake_B = cast_img(fake_A, cd), cast_img(fake_B, cd)

        def d_basic(mod, params, real, fake):
            pred_real = mod.apply({"params": params}, real)
            pred_fake = mod.apply({"params": params}, jax.lax.stop_gradient(fake))
            return 0.5 * (
                gan_loss(pred_real, True, cfg.gan_mode)
                + gan_loss(pred_fake, False, cfg.gan_mode)
            )

        loss_D_A = d_basic(self.D_A, d_params["D_A"], batch["real_B"], fake_B)
        loss_D_B = d_basic(self.D_B, d_params["D_B"], batch["real_A"], fake_A)
        return loss_D_A + loss_D_B, {"D_A": loss_D_A, "D_B": loss_D_B}

    # -- the jitted steps -----------------------------------------------------

    def train_step(self):
        """E-step (G then D). For mogan, alternate with ``m_step`` at the
        host level like the reference's e_step toggle (:297-331)."""
        if "e" in self._steps:
            return self._steps["e"]

        def step(state: CycleGANState, batch, rng):
            params = state.params
            g_params = {k: v for k, v in params.items()
                        if k.startswith("G") or k.startswith("F")}
            d_params = {k: v for k, v in params.items() if k.startswith("D")}

            aux = {}
            if self.cfg.variant == "mogan":
                # M nets are frozen in the E step; their warped flow enters
                # the MT loss as a constant
                bf_A = self._compute_raft(batch["real_A2"], batch["real_A"])
                bf_B = self._compute_raft(batch["real_B2"], batch["real_B"])
                aux["bf_M_A"] = self.M_A.apply({"params": params["M_A"]}, bf_A)
                aux["bf_M_B"] = self.M_B.apply({"params": params["M_B"]}, bf_B)

            grad_fn = jax.value_and_grad(self._g_loss, has_aux=True)
            (_, (g_losses, fake_A, fake_B)), g_grads = grad_fn(
                g_params, d_params, batch, aux
            )
            g_updates, opt_g = self.tx_g.update(g_grads, state.opt_g, g_params)
            g_params = optax.apply_updates(g_params, g_updates)

            rng_a, rng_b = jax.random.split(rng)
            pool_a, fake_A_q = image_pool_query(
                state.pool_a, f32(jax.lax.stop_gradient(fake_A)), rng_a,
                self.cfg.pool_size
            )
            pool_b, fake_B_q = image_pool_query(
                state.pool_b, f32(jax.lax.stop_gradient(fake_B)), rng_b,
                self.cfg.pool_size
            )

            d_grad_fn = jax.value_and_grad(self._d_loss, has_aux=True)
            (_, d_losses), d_grads = d_grad_fn(d_params, batch, fake_A_q, fake_B_q)
            d_updates, opt_d = self.tx_d.update(d_grads, state.opt_d, d_params)
            d_params = optax.apply_updates(d_params, d_updates)

            new_params = {**params, **g_params, **d_params}
            metrics = {**g_losses, **d_losses}
            return state.replace(
                step=state.step + 1, params=new_params,
                opt_g=opt_g, opt_d=opt_d, pool_a=pool_a, pool_b=pool_b,
            ), metrics

        self._steps["e"] = jax.jit(step, donate_argnums=(0,))
        return self._steps["e"]

    def m_step(self):
        """MoGAN M-step: auxiliary-motion loss trains only M_A/M_B
        (MoGAN cycle_gan_model.py:287-295)."""
        if "m" in self._steps:
            return self._steps["m"]
        assert self.cfg.variant == "mogan"

        def loss_m(m_params, params, batch):
            p = {**params, **m_params}
            fake_B = self._g_apply("G_A", p, batch["real_A"])
            fake_B2 = self._g_apply("G_A", p, batch["real_A2"])
            fake_A = self._g_apply("G_B", p, batch["real_B"])
            fake_A2 = self._g_apply("G_B", p, batch["real_B2"])
            bf_A = self._compute_raft(batch["real_A2"], batch["real_A"])
            bf_B = self._compute_raft(batch["real_B2"], batch["real_B"])
            bf_fake_B = self._compute_raft(fake_B2, fake_B)
            bf_fake_A = self._compute_raft(fake_A2, fake_A)
            bf_M_A = self.M_A.apply({"params": m_params["M_A"]}, bf_A)
            bf_M_B = self.M_B.apply({"params": m_params["M_B"]}, bf_B)
            loss_AM_A = jnp.mean(jnp.abs(bf_M_A - jax.lax.stop_gradient(bf_fake_B))) * self.cfg.lambda_AM
            loss_AM_B = jnp.mean(jnp.abs(bf_M_B - jax.lax.stop_gradient(bf_fake_A))) * self.cfg.lambda_AM
            return loss_AM_A + loss_AM_B, {"AM_A": loss_AM_A, "AM_B": loss_AM_B}

        def step(state: CycleGANState, batch):
            params = state.params
            m_params = {k: v for k, v in params.items() if k.startswith("M")}
            (_, m_losses), m_grads = jax.value_and_grad(loss_m, has_aux=True)(
                m_params, params, batch
            )
            m_updates, opt_m = self.tx_m.update(m_grads, state.opt_m, m_params)
            m_params = optax.apply_updates(m_params, m_updates)
            return state.replace(
                step=state.step + 1, params={**params, **m_params}, opt_m=opt_m
            ), m_losses

        self._steps["m"] = jax.jit(step, donate_argnums=(0,))
        return self._steps["m"]

    def generate_fn(self, which: str = "G_A"):
        mod = getattr(self, which)

        def fn(params, x):
            return mod.apply({"params": params[which]}, x)

        return jax.jit(fn)
