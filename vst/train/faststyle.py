"""Learning-based (LBST) feed-forward training — all five method heads.

TPU-native rebuild of the FastStyle trainer hierarchy
(``methods/learning-based/fast_style_transfer.py:165-264`` +
``fs_{johnson,dumoulin,huang,reconet,ruder}.py``): one pure jitted train
step per method, data-parallel over a ``jax.sharding.Mesh`` (the loss mean
spans the sharded batch axis, so GSPMD inserts the gradient reduction).

Method losses (emphasis parameters follow the reference defaults,
``fs_tests.py:51-72``):

* johnson  (α, β, δ)          = (1e0, 1e1, 1e-4): content r3_3 + Σ gram + TV
* dumoulin (α, β)             = (1e0, 1e1): johnson − TV, multi-style norm
* huang    (α, β, γ, δ)       = (1e0, 1e1, 1e2, 1e-4): two frames + output TCL
* reconet  (α, β, γf, γo, δ)  = (1e0, 1e1, 1e2, 1e2, 1e-4): + feature TCL +
  luminance-compensated output TCL
* ruder    (α, β, γ)          = (1e0, 1e1, 1e2): flow-aware 7-channel input,
  50% coin flip between unrolled sequence and zero-context mode, bootstrapped
  from a pretrained Johnson/Dumoulin model

Faithful quirks (PARITY.md): images enter the net in [0,1] and leave as
pixels/255; Johnson always uses style 0's Gram targets; ReCoNet scales the
x-flow channel by the H-ratio and the y-flow by the W-ratio exactly as the
reference does (``fs_reconet.py:58-59`` indexes NCHW shape[2]/shape[3] —
harmless for square crops, reproduced regardless).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import optax
import flax.struct

from vst.models.faststyle import FastStyleNet
from vst.perceptual.vgg import Vgg16Features
from vst.ops.losses import gram_matrix, tv_loss, normalize_imagenet
from vst.ops.sample import warp_masked
from vst.ops.image import resize_bilinear


def ref_lr_schedule(lr0: float, batch_size: int, floor: float = 1e-4):
    """LR decay parity with ``prep_adam`` (``fast_style_transfer.py:788-793``):
    divide by 1.2 every ``int(500/batch_size)`` iterations, floor 1e-4."""
    k = max(int(500 / batch_size), 1)

    def schedule(count):
        n = (count + 1) // k
        return jnp.maximum(lr0 / (1.2 ** n), floor)

    return schedule


def _mse(a, b):
    return jnp.mean((a - b) ** 2)


def _luma709(x):
    """Rec.709 luminance over the channel axis (``fs_reconet.py:67``)."""
    return (0.2126 * x[..., 0] + 0.7152 * x[..., 1] + 0.0722 * x[..., 2])[..., None]


@dataclasses.dataclass
class FastStyleConfig:
    method: str = "johnson"
    n_styles: int = 1
    emphasis: Tuple[float, ...] = (1e0, 1e1, 1e-4)
    lr: float = 1e-3
    batch_size: int = 16
    lr_floor: float = 1e-4
    n_frames: int = 2  # frames per training tuple (2 FC2, 3 CO2, 5 HW2/CO5)

    def __post_init__(self):
        expected = {"johnson": 3, "dumoulin": 2, "huang": 4, "reconet": 5, "ruder": 3}
        assert self.method in expected, f"unknown method {self.method}"
        assert len(self.emphasis) == expected[self.method], (
            f"{self.method} takes {expected[self.method]} emphasis params"
        )


class TrainState(flax.struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any


class FastStyleTrainer:
    """Owns the model/vgg/optimizer and builds the jitted train step.

    ``style_images``: (S, 512, 512, 3) float32 [0,1]. ``vgg_params``: a
    converted torchvision VGG16 params tree, or None for seeded init.
    ``pre_style_params``: required for ruder (the pretrained bootstrap model,
    ``fs_ruder.py:25-34``).
    """

    def __init__(
        self,
        cfg: FastStyleConfig,
        style_images: np.ndarray,
        vgg_params: Optional[dict] = None,
        pre_style_params: Optional[dict] = None,
        seed: int = 0,
    ):
        self.cfg = cfg
        num_inp = 7 if cfg.method == "ruder" else 3
        self.model = FastStyleNet(num_inp=num_inp, n_styles=cfg.n_styles)
        self.pre_model = FastStyleNet(num_inp=3, n_styles=cfg.n_styles)
        self.vgg = Vgg16Features()

        key = jax.random.PRNGKey(seed)
        k_vgg, k_model, k_pre = jax.random.split(key, 3)
        if vgg_params is None:
            from vst.perceptual.vgg import he_randomized_params

            dummy = jnp.zeros((1, 64, 64, 3), jnp.float32)
            # He-scaled random features — torch-default init vanishes by
            # relu3_3 and the perceptual losses lose all signal (see
            # he_randomized_params docstring)
            vgg_params = he_randomized_params(
                self.vgg.init(k_vgg, dummy)["params"], seed)
        self.vgg_params = vgg_params

        self.pre_style_params = pre_style_params
        if cfg.method == "ruder" and pre_style_params is None:
            # standalone fallback: seeded bootstrap net (reference requires a
            # trained checkpoint; tests exercise mechanics with a fresh one)
            dummy = jnp.zeros((1, 64, 64, 3), jnp.float32)
            self.pre_style_params = self.pre_model.init(k_pre, dummy, 1.0, 0)["params"]

        # Gram targets from 512² style images — loadStyles parity
        # (fast_style_transfer.py:740-756): normalize → vgg → gram per tap.
        grams: List[List[jnp.ndarray]] = []
        for s in range(style_images.shape[0]):
            img = jnp.asarray(style_images[s])[None]
            feats = self.vgg.apply({"params": self.vgg_params}, normalize_imagenet(img))
            grams.append([gram_matrix(f)[0] for f in feats])
        # stack per tap: list of (S, C_i, C_i)
        self.style_grams = [
            jnp.stack([grams[s][i] for s in range(len(grams))])
            for i in range(len(grams[0]))
        ]

        self.tx = optax.adam(ref_lr_schedule(cfg.lr, cfg.batch_size, cfg.lr_floor))
        self._train_step = None

    # -- setup ---------------------------------------------------------------

    def init_state(self, sample_batch, seed: int = 1) -> TrainState:
        img = jnp.asarray(sample_batch["imgs"][:1, 0])
        if self.cfg.method == "ruder":
            x = jnp.concatenate(
                [img, jnp.zeros(img.shape[:-1] + (1,)), jnp.zeros_like(img)], axis=-1
            )
        else:
            x = img
        params = self.model.init(jax.random.PRNGKey(seed), x, 1.0, 0)["params"]
        opt_state = self.tx.init(params)
        return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                          opt_state=opt_state)

    # -- method losses ---------------------------------------------------------

    def _vgg_feats(self, x):
        return self.vgg.apply({"params": self.vgg_params}, normalize_imagenet(x))

    def _style_loss(self, feats, style_id):
        loss = 0.0
        for i, g_all in enumerate(self.style_grams):
            g_s = jnp.take(g_all, style_id, axis=0, mode="clip")
            g_img = gram_matrix(feats[i])
            loss += jnp.mean((g_img - g_s[None]) ** 2)
        return loss

    def _apply(self, params, x, style_id):
        _, styled = self.model.apply({"params": params}, x, 1.0, style_id)
        return styled / 255.0

    def _apply_with_features(self, params, x, style_id):
        fmap, styled = self.model.apply({"params": params}, x, 1.0, style_id)
        return fmap, styled / 255.0

    def _loss_johnson(self, params, batch, style_id, rng):
        alpha, beta, delta = self.cfg.emphasis
        img = batch["imgs"][:, 0]
        styled = self._apply(params, img, style_id)
        sf = self._vgg_feats(styled)
        cf = self._vgg_feats(img)
        content = alpha * _mse(sf[2], cf[2])
        # quirk: johnson indexes self.styles[0], not style_id (fs_johnson.py:40)
        style = beta * self._style_loss(sf, 0)
        tv = delta * tv_loss(styled)
        loss = content + style + tv
        return loss, {"loss": loss, "content": content, "style": style, "tv": tv}

    def _loss_dumoulin(self, params, batch, style_id, rng):
        alpha, beta = self.cfg.emphasis
        img = batch["imgs"][:, 0]
        styled = self._apply(params, img, style_id)
        sf = self._vgg_feats(styled)
        cf = self._vgg_feats(img)
        content = alpha * _mse(sf[2], cf[2])
        style = beta * self._style_loss(sf, style_id)
        loss = content + style
        return loss, {"loss": loss, "content": content, "style": style}

    def _loss_huang(self, params, batch, style_id, rng):
        alpha, beta, gamma, delta = self.cfg.emphasis
        img1, img2 = batch["imgs"][:, 0], batch["imgs"][:, 1]
        mask, flow = batch["masks"][:, 0], batch["flows"][:, 0]
        s1 = self._apply(params, img1, style_id)
        s2 = self._apply(params, img2, style_id)
        sf1, sf2 = self._vgg_feats(s1), self._vgg_feats(s2)
        cf1, cf2 = self._vgg_feats(img1), self._vgg_feats(img2)
        content = (alpha / 2) * (_mse(sf1[2], cf1[2]) + _mse(sf2[2], cf2[2]))
        style = (beta / 2) * (self._style_loss(sf1, style_id) + self._style_loss(sf2, style_id))
        warped = warp_masked(s1, flow)
        temporal = gamma * jnp.mean((mask * (s2 - warped)) ** 2)
        tv = delta * tv_loss(s1)
        loss = content + style + temporal + tv
        return loss, {"loss": loss, "content": content, "style": style,
                      "temporal": temporal, "tv": tv}

    def _loss_reconet(self, params, batch, style_id, rng):
        alpha, beta, gamma_f, gamma_o, delta = self.cfg.emphasis
        img1, img2 = batch["imgs"][:, 0], batch["imgs"][:, 1]
        mask, flow = batch["masks"][:, 0], batch["flows"][:, 0]
        f1, s1 = self._apply_with_features(params, img1, style_id)
        f2, s2 = self._apply_with_features(params, img2, style_id)
        sf1, sf2 = self._vgg_feats(s1), self._vgg_feats(s2)
        cf1, cf2 = self._vgg_feats(img1), self._vgg_feats(img2)
        content = (alpha / 2) * (_mse(sf1[2], cf1[2]) + _mse(sf2[2], cf2[2]))
        style = (beta / 2) * (self._style_loss(sf1, style_id) + self._style_loss(sf2, style_id))
        tv = (delta / 2) * (tv_loss(s1) + tv_loss(s2))

        fh, fw = f1.shape[1], f1.shape[2]
        H, W = flow.shape[1], flow.shape[2]
        feat_flow = resize_bilinear(flow, (fh, fw), align_corners=False)
        # reference quirk (fs_reconet.py:58-59): ch0 scaled by H-ratio,
        # ch1 by W-ratio (NCHW shape[2]/shape[3])
        feat_flow = feat_flow * jnp.asarray([fh / H, fw / W], feat_flow.dtype)
        feat_mask = resize_bilinear(mask, (fh, fw), align_corners=False)
        warped_f = warp_masked(f1, feat_flow)
        f_temporal = gamma_f * jnp.mean((feat_mask * (f2 - warped_f)) ** 2)

        out_term = s2 - warp_masked(s1, flow)
        in_term = img2 - warp_masked(img1, flow)
        in_term = _luma709(in_term)
        o_temporal = gamma_o * jnp.mean((mask * (out_term - in_term)) ** 2)

        loss = content + style + f_temporal + o_temporal + tv
        return loss, {"loss": loss, "content": content, "style": style,
                      "f_temporal": f_temporal, "o_temporal": o_temporal, "tv": tv}

    def _ruder_cat(self, img, mask, warped):
        return jnp.concatenate([img, mask, warped], axis=-1)

    def _loss_ruder(self, params, batch, style_id, rng):
        alpha, beta, gamma = self.cfg.emphasis
        imgs = batch["imgs"]      # (B, n, H, W, 3)
        masks = batch["masks"]    # (B, n−1, H, W, 1)
        flows = batch["flows"]    # (B, n−1, H, W, 2)
        n = imgs.shape[1]

        def roll_branch(_):
            # sequence mode: bootstrap frame 0 with the pretrained model,
            # then unroll the flow-aware net (fs_ruder.py:46-75). The
            # reference cascade handles n ∈ {2, 3, 5}; we unroll any n ≥ 2.
            _, s_prev = self.pre_model.apply(
                {"params": self.pre_style_params}, imgs[:, 0], 1.0, style_id
            )
            s_prev = s_prev / 255.0
            styled = s_prev
            warped = s_prev
            for t in range(1, n):
                warped = warp_masked(styled, flows[:, t - 1])
                x = self._ruder_cat(imgs[:, t], masks[:, t - 1], warped)
                _, styled = self.model.apply({"params": params}, x, 1.0, style_id)
                styled = styled / 255.0
            temporal = gamma * jnp.mean((masks[:, -1] * (warped - styled)) ** 2)
            return imgs[:, n - 1], styled, temporal

        def zero_branch(_):
            x = self._ruder_cat(
                imgs[:, 1], jnp.zeros_like(masks[:, 0]), jnp.zeros_like(imgs[:, 1])
            )
            _, styled = self.model.apply({"params": params}, x, 1.0, style_id)
            styled = styled / 255.0
            return imgs[:, 1], styled, jnp.zeros((), styled.dtype)

        coin = jax.random.uniform(rng) < 0.5
        loss_img, loss_styled, temporal = jax.lax.cond(coin, roll_branch, zero_branch, None)

        sf = self._vgg_feats(loss_styled)
        cf = self._vgg_feats(loss_img)
        content = alpha * _mse(sf[2], cf[2])
        style = beta * self._style_loss(sf, style_id)
        loss = content + style + temporal
        return loss, {"loss": loss, "content": content, "style": style,
                      "temporal": temporal}

    # -- train step -----------------------------------------------------------

    def loss_fn(self, params, batch, style_id, rng):
        fn = getattr(self, f"_loss_{self.cfg.method}")
        return fn(params, batch, style_id, rng)

    def train_step(self):
        """Returns the jitted step: (state, batch, style_id, rng) → (state, metrics)."""
        if self._train_step is not None:
            return self._train_step

        def step(state: TrainState, batch, style_id, rng):
            grad_fn = jax.value_and_grad(self.loss_fn, has_aux=True)
            (_, metrics), grads = grad_fn(state.params, batch, style_id, rng)
            updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            return state.replace(step=state.step + 1, params=params,
                                 opt_state=opt_state), metrics

        self._train_step = jax.jit(step, donate_argnums=(0,))
        return self._train_step

    # -- inference ---------------------------------------------------------

    def stylize_fn(self):
        """Jitted per-frame inference: (params, img [0,1], style_id) →
        styled [0,1] (clipped) — parity with ``infer_method`` + clamp
        (``fast_style_transfer.py:838-841``)."""

        def fn(params, img, style_id):
            _, styled = self.model.apply({"params": params}, img, 1.0, style_id)
            return jnp.clip(styled / 255.0, 0.0, 1.0)

        return jax.jit(fn)
