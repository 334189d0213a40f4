"""CycleGAN/pix2pix network zoo — parity with
``methods/GAN-based/CycleGAN/models/networks.py``.

Factory functions mirror ``define_G``/``define_D`` (:119-204): resnet_9blocks
(default) / resnet_6blocks / unet_256 / unet_128 generators; basic 70×70
PatchGAN / n_layers / pixel discriminators. Norm default 'instance'
(affine=False, conv bias on), init normal(0, 0.02) (:67-99).

All NHWC flax modules; the image range is [−1, 1] (tanh output).
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from vst.nn.norm import instance_norm
from vst.ops.image import reflect_pad


def _normal_init(std=0.02):
    def init(key, shape, dtype=jnp.float32):
        return std * jax.random.normal(key, shape, dtype)

    return init


class _Conv(nn.Module):
    """Conv with junyanz init (normal 0.02) and torch-style symmetric pad."""

    features: int
    kernel: int
    stride: int = 1
    pad: int = 0
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        return nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=((self.pad, self.pad), (self.pad, self.pad)),
            use_bias=self.use_bias,
            kernel_init=_normal_init(0.02),
            bias_init=nn.initializers.zeros,
        )(x)


class _ConvT(nn.Module):
    """torch ConvTranspose2d(k, s=2, p, output_padding=op) EXACT equivalent
    (verified numerically): flax padding (k−1−p, k−1−p+op) per dim,
    transpose_kernel=True; torch weight (in, out, kh, kw) converts as
    transpose(2,3,1,0) → (kh, kw, out, in). Resnet decoder uses
    (k=3, p=1, op=1); UNet uses (k=4, p=1, op=0)."""

    features: int
    kernel: int = 3
    torch_pad: int = 1
    out_pad: int = 1

    @nn.compact
    def __call__(self, x):
        lo = self.kernel - 1 - self.torch_pad
        hi = lo + self.out_pad
        return nn.ConvTranspose(
            self.features,
            (self.kernel, self.kernel),
            strides=(2, 2),
            padding=((lo, hi), (lo, hi)),
            transpose_kernel=True,
            use_bias=True,
            kernel_init=_normal_init(0.02),
            bias_init=nn.initializers.zeros,
        )(x)


class _Norm(nn.Module):
    """'instance' (affine=False — junyanz get_norm_layer), 'batch' (eval,
    stored stats), or 'none'."""

    kind: str = "instance"

    @nn.compact
    def __call__(self, x):
        if self.kind == "instance":
            return instance_norm(x)
        if self.kind == "none":
            return x
        if self.kind == "batch":
            c = x.shape[-1]
            mean = self.param("running_mean", nn.initializers.zeros, (c,))
            var = self.param("running_var", nn.initializers.ones, (c,))
            scale = self.param("scale", _normal_init_ones, (c,))
            bias = self.param("bias", nn.initializers.zeros, (c,))
            return (x - mean) / jnp.sqrt(var + 1e-5) * scale + bias
        raise ValueError(self.kind)


def _normal_init_ones(key, shape, dtype=jnp.float32):
    return 1.0 + 0.02 * jax.random.normal(key, shape, dtype)


class ResnetBlock(nn.Module):
    """networks.py ResnetBlock: reflect-pad conv-norm-relu-conv-norm + skip."""

    dim: int
    norm: str = "instance"

    @nn.compact
    def __call__(self, x):
        y = reflect_pad(x, 1)
        y = _Conv(self.dim, 3)(y)
        y = nn.relu(_Norm(self.norm)(y))
        y = reflect_pad(y, 1)
        y = _Conv(self.dim, 3)(y)
        y = _Norm(self.norm)(y)
        return x + y


class ResnetGenerator(nn.Module):
    """c7s1-64, d128, d256, n× resnet blocks, u128, u64, c7s1-out, tanh
    (networks.py:316-379). output_nc 3 for images, 2 for MoGAN's motion
    translators (MoGAN/models/cycle_gan_model.py:95-99)."""

    output_nc: int = 3
    ngf: int = 64
    n_blocks: int = 9
    norm: str = "instance"

    @nn.compact
    def __call__(self, x):
        x = reflect_pad(x, 3)
        x = nn.relu(_Norm(self.norm)(_Conv(self.ngf, 7)(x)))
        x = nn.relu(_Norm(self.norm)(_Conv(self.ngf * 2, 3, stride=2, pad=1)(x)))
        x = nn.relu(_Norm(self.norm)(_Conv(self.ngf * 4, 3, stride=2, pad=1)(x)))
        for _ in range(self.n_blocks):
            x = ResnetBlock(self.ngf * 4, self.norm)(x)
        x = nn.relu(_Norm(self.norm)(_ConvT(self.ngf * 2)(x)))
        x = nn.relu(_Norm(self.norm)(_ConvT(self.ngf)(x)))
        x = reflect_pad(x, 3)
        x = _Conv(self.output_nc, 7)(x)
        return jnp.tanh(x)


class UnetGenerator(nn.Module):
    """U-Net generator (networks.py:436-510): num_downs nested
    UnetSkipConnectionBlocks. unet_256 → 8 downs, unet_128 → 7. Channels:
    outer ngf → 2ngf → 4ngf → 8ngf, then (num_downs−4) innermost blocks at
    8ngf. Non-outer blocks concat their input with their upsampled output."""

    output_nc: int = 3
    num_downs: int = 8
    ngf: int = 64
    norm: str = "instance"

    @nn.compact
    def __call__(self, x):
        down_ch = [self.ngf, self.ngf * 2, self.ngf * 4] + [self.ngf * 8] * (
            self.num_downs - 3
        )

        def block(h, level):
            inner_ch = down_ch[level]
            outermost = level == 0
            innermost = level == self.num_downs - 1

            d = h if outermost else nn.leaky_relu(h, 0.2)
            d = _Conv(inner_ch, 4, stride=2, pad=1)(d)
            if not outermost and not innermost:
                d = _Norm(self.norm)(d)

            if innermost:
                mid = d
            else:
                mid = block(d, level + 1)

            u = nn.relu(mid)
            up_ch = self.output_nc if outermost else down_ch[max(level - 1, 0)]
            u = _ConvT(up_ch, kernel=4, torch_pad=1, out_pad=0)(u)
            if outermost:
                return jnp.tanh(u)
            u = _Norm(self.norm)(u)
            return jnp.concatenate([h, u], axis=-1)

        return block(x, 0)


class NLayerDiscriminator(nn.Module):
    """70×70 PatchGAN (networks.py:513-551): C64(no norm)-C128-C256-C512(s1)
    → 1-channel patch logits. LeakyReLU 0.2."""

    ndf: int = 64
    n_layers: int = 3
    norm: str = "instance"

    @nn.compact
    def __call__(self, x):
        x = nn.leaky_relu(_Conv(self.ndf, 4, stride=2, pad=1)(x), 0.2)
        mult = 1
        for n in range(1, self.n_layers):
            mult = min(2 ** n, 8)
            x = _Conv(self.ndf * mult, 4, stride=2, pad=1, use_bias=True)(x)
            x = nn.leaky_relu(_Norm(self.norm)(x), 0.2)
        mult = min(2 ** self.n_layers, 8)
        x = _Conv(self.ndf * mult, 4, stride=1, pad=1)(x)
        x = nn.leaky_relu(_Norm(self.norm)(x), 0.2)
        return _Conv(1, 4, stride=1, pad=1)(x)


class PixelDiscriminator(nn.Module):
    """1×1 PatchGAN (networks.py:554-579)."""

    ndf: int = 64
    norm: str = "instance"

    @nn.compact
    def __call__(self, x):
        x = nn.leaky_relu(_Conv(self.ndf, 1)(x), 0.2)
        x = nn.leaky_relu(_Norm(self.norm)(_Conv(self.ndf * 2, 1)(x)), 0.2)
        return _Conv(1, 1)(x)


def define_G(netG: str = "resnet_9blocks", output_nc: int = 3, ngf: int = 64,
             norm: str = "instance") -> nn.Module:
    """networks.py:119-162."""
    if netG == "resnet_9blocks":
        return ResnetGenerator(output_nc, ngf, 9, norm)
    if netG == "resnet_6blocks":
        return ResnetGenerator(output_nc, ngf, 6, norm)
    if netG == "unet_256":
        return UnetGenerator(output_nc, 8, ngf, norm)
    if netG == "unet_128":
        return UnetGenerator(output_nc, 7, ngf, norm)
    raise ValueError(netG)


def define_D(netD: str = "basic", ndf: int = 64, n_layers: int = 3,
             norm: str = "instance") -> nn.Module:
    """networks.py:165-204."""
    if netD == "basic":
        return NLayerDiscriminator(ndf, 3, norm)
    if netD == "n_layers":
        return NLayerDiscriminator(ndf, n_layers, norm)
    if netD == "pixel":
        return PixelDiscriminator(ndf, norm)
    raise ValueError(netD)


# ---------------------------------------------------------------------------
# GAN losses (networks.py:209-313)
# ---------------------------------------------------------------------------

def gan_loss(pred: jnp.ndarray, target_is_real: bool, mode: str = "lsgan"):
    """GANLoss parity: lsgan = MSE vs 1/0 labels; vanilla = BCE-with-logits;
    wgangp = −mean(pred) for real, +mean(pred) for fake."""
    pred = pred.astype(jnp.float32)  # loss reductions accumulate f32
    if mode == "lsgan":
        target = 1.0 if target_is_real else 0.0
        return jnp.mean((pred - target) ** 2)
    if mode == "vanilla":
        target = jnp.ones_like(pred) if target_is_real else jnp.zeros_like(pred)
        return jnp.mean(
            jnp.maximum(pred, 0) - pred * target + jnp.log1p(jnp.exp(-jnp.abs(pred)))
        )
    if mode == "wgangp":
        return -jnp.mean(pred) if target_is_real else jnp.mean(pred)
    raise ValueError(mode)


def gradient_penalty(d_apply, d_params, real, fake, rng,
                     mode: str = "mixed", constant: float = 1.0,
                     lambda_gp: float = 10.0):
    """cal_gradient_penalty parity (networks.py:278-313): gradient of D at
    interpolates, L2 norm over flattened per-sample dims, (‖g‖−c)²·λ.
    The +1e-16 epsilon inside the norm is kept."""
    if mode == "real":
        x = real
    elif mode == "fake":
        x = fake
    else:
        alpha = jax.random.uniform(rng, (real.shape[0], 1, 1, 1))
        x = alpha * real + (1 - alpha) * fake

    def d_sum(xi):
        return jnp.sum(d_apply(d_params, xi))

    grads = jax.grad(d_sum)(x)
    g = grads.reshape(real.shape[0], -1)
    norm = jnp.sqrt(jnp.sum((g + 1e-16) ** 2, axis=1))
    return jnp.mean((norm - constant) ** 2) * lambda_gp


# ---------------------------------------------------------------------------
# ImagePool (util/image_pool.py:5-54) — functional on-device ring buffer
# ---------------------------------------------------------------------------

def image_pool_init(pool_size: int, image_shape, dtype=jnp.float32):
    """State: (buffer (P, H, W, C), count). pool_size=0 disables the pool."""
    return {
        "buffer": jnp.zeros((max(pool_size, 1),) + tuple(image_shape), dtype),
        "count": jnp.zeros((), jnp.int32),
    }


def image_pool_query(state, images, rng, pool_size: int = 50):
    """Per incoming image: while the pool is unfilled, insert and return the
    image; else with p=0.5 swap with a random pool slot and return the old
    image, else return the image (image_pool.py:23-54). Pure function:
    returns (new_state, out_images)."""
    if pool_size == 0:
        return state, images

    def per_image(carry, inp):
        buffer, count = carry
        img, key = inp
        k1, k2 = jax.random.split(key)

        def insert(_):
            buf = jax.lax.dynamic_update_index_in_dim(buffer, img, count, 0)
            return buf, count + 1, img

        def maybe_swap(_):
            use_old = jax.random.uniform(k1) > 0.5
            idx = jax.random.randint(k2, (), 0, pool_size)
            old = buffer[idx]

            def swap(_):
                buf = jax.lax.dynamic_update_index_in_dim(buffer, img, idx, 0)
                return buf, count, old

            def keep(_):
                return buffer, count, img

            return jax.lax.cond(use_old, swap, keep, None)

        buf, cnt, out = jax.lax.cond(count < pool_size, insert, maybe_swap, None)
        return (buf, cnt), out

    keys = jax.random.split(rng, images.shape[0])
    (buf, cnt), outs = jax.lax.scan(
        per_image, (state["buffer"], state["count"]), (images, keys)
    )
    return {"buffer": buf, "count": cnt}, outs


class FusionBlock(nn.Module):
    """ConGAN fusion net — parity with
    ``ConGAN/models/networks.py:659-715``: 3 reflect-pad convs (IN affine +
    ReLU ×2, sigmoid head) on (styled − warped) → per-pixel mask m;
    output = m·warped + (1−m)·styled."""

    @nn.compact
    def __call__(self, simg, wimg):
        from vst.nn.conv import ConvLayer
        from vst.nn.norm import InstanceNorm

        h = simg - wimg
        h = nn.relu(InstanceNorm(affine=True)(ConvLayer(32, 3)(h)))
        h = nn.relu(InstanceNorm(affine=True)(ConvLayer(32, 3)(h)))
        mask = nn.sigmoid(ConvLayer(1, 3)(h))
        return mask * wimg + (1 - mask) * simg
