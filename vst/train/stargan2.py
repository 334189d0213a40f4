"""StarGAN v2 solver (Adv / AdvCon) — parity with
``StarGANv2Adv/core/solver.py:125-238`` + AdvCon's enabled TCL
(``StarGANv2AdvCon/core/solver.py:385-451``).

Per iteration:
1. D step with latent style  (BCE adv + R1 on reals, λ_reg=1)
2. D step with reference style
3. G step (latent): adv + λ_sty·style-recon − λ_ds·diversity(**disabled,
   zeroed** in the thesis, solver.py:404-414) + λ_cyc·cycle
   [+ λ_tcl·TCL on the pseudo-paired second frame — AdvCon only]
   → steps G, mapping network F, AND style encoder E
4. G step (reference): same loss with style-encoder styles → steps G only
5. EMA update (β=0.999 lerp) of G/F/E    (:453-455)
6. λ_ds linear decay (kept for parity even though ds is zeroed, :194-196)

Optimizers: Adam(β=(0, 0.99), weight_decay 1e-4), lr 1e-4 (F: 1e-6)
(core/solver.py:50-61). R1 is grad-of-grad under jit.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import optax
import flax.struct

from vst.models.stargan2 import (
    Generator,
    MappingNetwork,
    StyleEncoder,
    Discriminator,
)
from vst.ops.sample import warp
from vst.train.policy import cast_img, cast_tree, compute_dtype_of, f32


@dataclasses.dataclass
class StarGAN2Config:
    img_size: int = 256
    style_dim: int = 64
    latent_dim: int = 16
    num_domains: int = 4
    w_hpf: int = 0
    lambda_reg: float = 1.0
    lambda_sty: float = 1.0
    lambda_ds: float = 1.0   # decayed to 0 over ds_iter; loss itself zeroed
    lambda_cyc: float = 1.0
    lambda_tcl: float = 0.0  # AdvCon: 100 (StarGANv2AdvCon/main.py:94)
    ds_iter: int = 100_000
    lr: float = 1e-4
    f_lr: float = 1e-6
    beta1: float = 0.0
    beta2: float = 0.99
    weight_decay: float = 1e-4
    ema_beta: float = 0.999
    max_conv_dim: int = 512
    # optional bf16 compute policy (vst/train/policy.py): master params and
    # norm stats stay f32; "bfloat16" runs the conv/matmul path on the MXU
    # at native rate. None = reference-parity f32.
    compute_dtype: Optional[str] = None


class StarGAN2State(flax.struct.PyTreeNode):
    step: jnp.ndarray
    params: Dict[str, Any]       # generator / mapping / style_enc / disc
    ema: Dict[str, Any]          # EMA copies of generator / mapping / style_enc
    opts: Dict[str, Any]
    lambda_ds: jnp.ndarray


def adv_loss(logits, target: int):
    """BCE-with-logits vs constant target (solver.py:459-463).
    Computed in f32 regardless of the activation dtype (log1p/exp in bf16
    lose the loss's low-order digits)."""
    logits = logits.astype(jnp.float32)
    t = float(target)
    return jnp.mean(
        jnp.maximum(logits, 0) - logits * t + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )


class StarGAN2Trainer:
    def __init__(self, cfg: StarGAN2Config, seed: int = 0):
        self.cfg = cfg
        self.G = Generator(cfg.img_size, cfg.style_dim, cfg.max_conv_dim, cfg.w_hpf)
        self.F = MappingNetwork(cfg.latent_dim, cfg.style_dim, cfg.num_domains)
        self.E = StyleEncoder(cfg.img_size, cfg.style_dim, cfg.num_domains,
                              cfg.max_conv_dim)
        self.D = Discriminator(cfg.img_size, cfg.num_domains, cfg.max_conv_dim)

        def adamw(lr):
            return optax.adamw(lr, b1=cfg.beta1, b2=cfg.beta2,
                               weight_decay=cfg.weight_decay)

        self.tx = {
            "generator": adamw(cfg.lr),
            "mapping": adamw(cfg.f_lr),
            "style_enc": adamw(cfg.lr),
            "disc": adamw(cfg.lr),
        }
        self._steps = {}

    # -- init --------------------------------------------------------------

    def init_state(self, seed: int = 0) -> StarGAN2State:
        cfg = self.cfg
        H = cfg.img_size
        img = jnp.zeros((1, H, H, 3), jnp.float32)
        z = jnp.zeros((1, cfg.latent_dim), jnp.float32)
        y = jnp.zeros((1,), jnp.int32)
        s = jnp.zeros((1, cfg.style_dim), jnp.float32)
        ks = jax.random.split(jax.random.PRNGKey(seed), 4)
        params = {
            "generator": self.G.init(ks[0], img, s)["params"],
            "mapping": self.F.init(ks[1], z, y)["params"],
            "style_enc": self.E.init(ks[2], img, y)["params"],
            "disc": self.D.init(ks[3], img, y)["params"],
        }
        ema = {k: jax.tree.map(jnp.copy, params[k])
               for k in ("generator", "mapping", "style_enc")}
        opts = {k: self.tx[k].init(params[k]) for k in self.tx}
        return StarGAN2State(
            step=jnp.zeros((), jnp.int32), params=params, ema=ema, opts=opts,
            lambda_ds=jnp.asarray(cfg.lambda_ds, jnp.float32),
        )

    # -- applies -----------------------------------------------------------

    def _style(self, params, kind, y, z=None, x_ref=None):
        if kind == "latent":
            return self.F.apply({"params": params["mapping"]}, z, y)
        return self.E.apply({"params": params["style_enc"]}, x_ref, y)

    # -- D step --------------------------------------------------------------

    def d_step(self, kind: str):
        key = ("d", kind)
        if key in self._steps:
            return self._steps[key]
        cfg = self.cfg

        def loss_fn(d_params, params, x_real, y_org, y_trg, z, x_ref):
            cd = compute_dtype_of(cfg.compute_dtype)
            d_params = cast_tree(d_params, cd)
            params = cast_tree(params, cd)
            x_real = cast_img(x_real, cd)
            z = cast_img(z, cd)
            x_ref = cast_img(x_ref, cd)
            out = self.D.apply({"params": d_params}, x_real, y_org)
            loss_real = adv_loss(out, 1)

            # R1: 0.5·E[‖∇ₓ D(x)‖²] on reals (solver.py:465-475); the
            # squared-norm reduction accumulates in f32
            def d_sum(x):
                return jnp.sum(f32(
                    self.D.apply({"params": d_params}, x, y_org)))

            g = f32(jax.grad(d_sum)(x_real))
            loss_reg = 0.5 * jnp.mean(jnp.sum(
                (g ** 2).reshape(x_real.shape[0], -1), axis=1))

            s_trg = jax.lax.stop_gradient(
                self._style(params, kind, y_trg, z, x_ref)
            )
            x_fake = jax.lax.stop_gradient(
                self.G.apply({"params": params["generator"]}, x_real, s_trg)
            )
            out_f = self.D.apply({"params": d_params}, x_fake, y_trg)
            loss_fake = adv_loss(out_f, 0)

            loss = loss_real + loss_fake + cfg.lambda_reg * loss_reg
            return loss, {"real": loss_real, "fake": loss_fake, "reg": loss_reg}

        def step(state: StarGAN2State, x_real, y_org, y_trg, z, x_ref):
            (_, m), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params["disc"], state.params, x_real, y_org, y_trg, z, x_ref
            )
            updates, opt = self.tx["disc"].update(
                grads, state.opts["disc"], state.params["disc"]
            )
            params = dict(state.params)
            params["disc"] = optax.apply_updates(params["disc"], updates)
            opts = dict(state.opts)
            opts["disc"] = opt
            return state.replace(params=params, opts=opts), m

        self._steps[key] = jax.jit(step, donate_argnums=(0,))
        return self._steps[key]

    # -- G step --------------------------------------------------------------

    def g_step(self, kind: str, update_fe: bool):
        """kind='latent' updates G+F+E (solver.py:179-183); kind='ref' updates
        G only (:184-187)."""
        key = ("g", kind, update_fe)
        if key in self._steps:
            return self._steps[key]
        cfg = self.cfg
        subset = ("generator", "mapping", "style_enc") if update_fe else ("generator",)

        def loss_fn(sub_params, params, batch):
            cd = compute_dtype_of(cfg.compute_dtype)
            p = cast_tree({**params, **sub_params}, cd)
            batch = {k: cast_img(v, cd)
                     if k in ("x_real", "x_real2", "x_ref", "x_ref2", "z",
                              "z2", "flow", "mask") else v
                     for k, v in batch.items()}
            x_real, y_org, y_trg = batch["x_real"], batch["y_org"], batch["y_trg"]
            s_trg = self._style(p, kind, y_trg, batch.get("z"), batch.get("x_ref"))

            x_fake = self.G.apply({"params": p["generator"]}, x_real, s_trg)
            out = self.D.apply({"params": p["disc"]}, x_fake, y_trg)
            loss_adv = adv_loss(out, 1)

            s_pred = self.E.apply({"params": p["style_enc"]}, x_fake, y_trg)
            loss_sty = jnp.mean(jnp.abs(f32(s_pred) - f32(s_trg)))

            loss_ds = jnp.zeros(())  # diversity loss disabled (solver.py:404-414)

            s_org = self.E.apply({"params": p["style_enc"]}, x_real, y_org)
            x_rec = self.G.apply({"params": p["generator"]}, x_fake, s_org)
            loss_cyc = jnp.mean(jnp.abs(f32(x_rec) - f32(x_real)))

            loss = (loss_adv + cfg.lambda_sty * loss_sty
                    - batch["lambda_ds"] * loss_ds + cfg.lambda_cyc * loss_cyc)
            metrics = {"adv": loss_adv, "sty": loss_sty, "ds": loss_ds,
                       "cyc": loss_cyc}

            if cfg.lambda_tcl > 0:
                # AdvCon TCL (StarGANv2AdvCon/core/solver.py:426-446):
                # flowtools-convention warp of x_fake with the GT flow
                x_fake2 = self.G.apply({"params": p["generator"]},
                                       batch["x_real2"], s_trg)
                x_warp = warp(x_fake, batch["flow"])
                loss_tcl = jnp.mean((f32(batch["mask"]) * (f32(x_fake2) - f32(x_warp))) ** 2)
                loss = loss + cfg.lambda_tcl * loss_tcl
                metrics["tcl"] = loss_tcl

            return loss, metrics

        def step(state: StarGAN2State, batch):
            sub = {k: state.params[k] for k in subset}
            batch = dict(batch)
            batch["lambda_ds"] = state.lambda_ds
            (_, m), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                sub, state.params, batch
            )
            params = dict(state.params)
            opts = dict(state.opts)
            for k in subset:
                updates, opts[k] = self.tx[k].update(grads[k], state.opts[k],
                                                     params[k])
                params[k] = optax.apply_updates(params[k], updates)
            return state.replace(params=params, opts=opts), m

        self._steps[key] = jax.jit(step, donate_argnums=(0,))
        return self._steps[key]

    # -- EMA + ds decay (one jitted housekeeping step) -----------------------

    def ema_step(self):
        if "ema" in self._steps:
            return self._steps["ema"]
        cfg = self.cfg

        def step(state: StarGAN2State):
            # torch.lerp(param, param_test, β): ema = param + β·(ema − param)
            ema = {
                k: jax.tree.map(
                    lambda p, e: p + cfg.ema_beta * (e - p),
                    state.params[k], state.ema[k],
                )
                for k in state.ema
            }
            lam = jnp.maximum(
                state.lambda_ds - cfg.lambda_ds / cfg.ds_iter, 0.0
            )
            return state.replace(step=state.step + 1, ema=ema, lambda_ds=lam)

        self._steps["ema"] = jax.jit(step, donate_argnums=(0,))
        return self._steps["ema"]

    # -- full iteration (host-level orchestration like solver.train) ---------

    def train_iteration(self, state, batch, rng):
        """One reference iteration: d(latent), d(ref), g(latent, G+F+E),
        g(ref, G-only), EMA+decay. ``batch`` needs x_real, x_ref, x_ref2
        (unused — ds disabled), y_org, y_trg [, x_real2, mask, flow for
        AdvCon]."""
        k1, k2 = jax.random.split(rng)
        z = jax.random.normal(k1, (batch["x_real"].shape[0], self.cfg.latent_dim))
        z2 = jax.random.normal(k2, (batch["x_real"].shape[0], self.cfg.latent_dim))

        state, d_lat = self.d_step("latent")(
            state, batch["x_real"], batch["y_org"], batch["y_trg"], z, batch["x_ref"]
        )
        state, d_ref = self.d_step("ref")(
            state, batch["x_real"], batch["y_org"], batch["y_trg"], z, batch["x_ref"]
        )
        g_batch = dict(batch)
        g_batch["z"] = z
        state, g_lat = self.g_step("latent", update_fe=True)(state, g_batch)
        state, g_ref = self.g_step("ref", update_fe=False)(state, g_batch)
        state = self.ema_step()(state)
        metrics = {
            **{f"D/latent_{k}": v for k, v in d_lat.items()},
            **{f"D/ref_{k}": v for k, v in d_ref.items()},
            **{f"G/latent_{k}": v for k, v in g_lat.items()},
            **{f"G/ref_{k}": v for k, v in g_ref.items()},
        }
        return state, metrics

    def generate_fn(self, use_ema: bool = True):
        def fn(state_params, x, s):
            return self.G.apply({"params": state_params["generator"]}, x, s)

        return jax.jit(fn)

    def mapping_fn(self, use_ema: bool = True):
        def fn(state_params, z, y):
            return self.F.apply({"params": state_params["mapping"]}, z, y)

        return jax.jit(fn)
