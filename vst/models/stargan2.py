"""StarGAN v2 nets — parity with ``StarGANv2Adv/core/model.py``.

Generator (encoder ResBlks → AdaIN decoder ResBlks), MappingNetwork
(z → per-domain style codes), StyleEncoder, multi-domain Discriminator.
All residual paths scale by 1/√2 (unit variance, model.py:64). The FAN
high-pass branch is gated on ``w_hpf > 0`` — the thesis runs w_hpf=0
(``StarGANv2Adv/main.py:91``), so masks default to None; HighPass is
implemented for completeness, the FAN landmark net itself is out of scope
for FC2/Sintel data (no faces).

Initialization: he_init parity (``core/utils.py:53-60`` — kaiming normal
fan_in on convs/linears, zero bias).
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from vst.nn.norm import InstanceNorm, instance_norm
from vst.ops.image import avg_pool2d, resize_nearest, resize_bilinear


def _he_init(key, shape, dtype=jnp.float32):
    """kaiming_normal_(mode='fan_in', nonlinearity='relu') on conv kernels
    (kh, kw, in, out) / dense (in, out)."""
    if len(shape) == 4:
        fan_in = shape[0] * shape[1] * shape[2]
    else:
        fan_in = shape[0]
    std = math.sqrt(2.0 / fan_in)
    return std * jax.random.normal(key, shape, dtype)


class _Conv(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    pad: int = 1
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        return nn.Conv(
            self.features, (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=((self.pad, self.pad), (self.pad, self.pad)),
            use_bias=self.use_bias,
            kernel_init=_he_init,
            bias_init=nn.initializers.zeros,
        )(x)


class _Dense(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        return nn.Dense(self.features, kernel_init=_he_init,
                        bias_init=nn.initializers.zeros)(x)


class ResBlk(nn.Module):
    """model.py:23-64: pre-activation residual, optional IN + downsample,
    learned 1×1 shortcut on channel change, out /√2."""

    dim_out: int
    normalize: bool = False
    downsample: bool = False

    @nn.compact
    def __call__(self, x):
        dim_in = x.shape[-1]

        sc = x
        if dim_in != self.dim_out:
            sc = _Conv(self.dim_out, 1, pad=0, use_bias=False, name="conv1x1")(sc)
        if self.downsample:
            sc = avg_pool2d(sc, 2, 2)

        h = x
        if self.normalize:
            h = InstanceNorm(affine=True, name="norm1")(h)
        h = nn.leaky_relu(h, 0.2)
        h = _Conv(dim_in, 3, name="conv1")(h)
        if self.downsample:
            h = avg_pool2d(h, 2, 2)
        if self.normalize:
            h = InstanceNorm(affine=True, name="norm2")(h)
        h = nn.leaky_relu(h, 0.2)
        h = _Conv(self.dim_out, 3, name="conv2")(h)

        return (sc + h) / math.sqrt(2)


class AdaIN(nn.Module):
    """model.py:67-77 — duplicated from vst.nn.norm with he_init linear."""

    num_features: int

    @nn.compact
    def __call__(self, x, s):
        h = _Dense(self.num_features * 2, name="fc")(s)
        gamma, beta = jnp.split(h, 2, axis=-1)
        out = instance_norm(x)
        return (1.0 + gamma[:, None, None, :]) * out + beta[:, None, None, :]


class AdainResBlk(nn.Module):
    """model.py:80-117: AdaIN-modulated residual, optional nearest 2×
    upsample; residual-only (no /√2, no shortcut) when w_hpf > 0."""

    dim_out: int
    w_hpf: int = 0
    upsample: bool = False

    @nn.compact
    def __call__(self, x, s):
        dim_in = x.shape[-1]

        h = AdaIN(dim_in, name="norm1")(x, s)
        h = nn.leaky_relu(h, 0.2)
        if self.upsample:
            h = resize_nearest(h, 2)
        h = _Conv(self.dim_out, 3, name="conv1")(h)
        h = AdaIN(self.dim_out, name="norm2")(h, s)
        h = nn.leaky_relu(h, 0.2)
        h = _Conv(self.dim_out, 3, name="conv2")(h)

        if self.w_hpf == 0:
            sc = x
            if self.upsample:
                sc = resize_nearest(sc, 2)
            if dim_in != self.dim_out:
                sc = _Conv(self.dim_out, 1, pad=0, use_bias=False, name="conv1x1")(sc)
            return (h + sc) / math.sqrt(2)
        return h


def high_pass(x: jnp.ndarray, w_hpf: float) -> jnp.ndarray:
    """model.py:120-129: depthwise 3×3 Laplacian / w_hpf."""
    filt = jnp.asarray(
        [[-1, -1, -1], [-1, 8.0, -1], [-1, -1, -1]], x.dtype
    ) / w_hpf
    C = x.shape[-1]
    kernel = jnp.tile(filt[:, :, None, None], (1, 1, 1, C))
    return jax.lax.conv_general_dilated(
        x, kernel, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=C,
    )


class Generator(nn.Module):
    """model.py:132-186."""

    img_size: int = 256
    style_dim: int = 64
    max_conv_dim: int = 512
    w_hpf: int = 0

    @nn.compact
    def __call__(self, x, s, masks: Optional[Sequence] = None):
        dim_in = 2 ** 14 // self.img_size
        repeat_num = int(np.log2(self.img_size)) - 4
        if self.w_hpf > 0:
            repeat_num += 1

        dims = [dim_in]
        for _ in range(repeat_num):
            dims.append(min(dims[-1] * 2, self.max_conv_dim))

        h = _Conv(dim_in, 3, name="from_rgb")(x)

        cache = {}
        for i in range(repeat_num):
            if masks is not None and h.shape[1] in (32, 64, 128):
                cache[h.shape[1]] = h
            h = ResBlk(dims[i + 1], normalize=True, downsample=True,
                       name=f"encode_{i}")(h)
        for i in range(2):
            h = ResBlk(dims[-1], normalize=True, name=f"encode_{repeat_num + i}")(h)

        # decoder blocks mirror the encoder (stack order, model.py:160-170)
        for i in range(2):
            h = AdainResBlk(dims[-1], w_hpf=self.w_hpf,
                            name=f"decode_{i}")(h, s)
        for i in range(repeat_num):
            out_dim = dims[repeat_num - 1 - i]
            h = AdainResBlk(out_dim, w_hpf=self.w_hpf, upsample=True,
                            name=f"decode_{2 + i}")(h, s)
            if masks is not None and h.shape[1] in (32, 64, 128):
                mask = masks[0] if h.shape[1] == 32 else masks[1]
                mask = resize_bilinear(mask, (h.shape[1], h.shape[2]))
                h = h + high_pass(mask * cache[h.shape[1]], self.w_hpf)

        h = InstanceNorm(affine=True, name="to_rgb_norm")(h)
        h = nn.leaky_relu(h, 0.2)
        return _Conv(3, 1, pad=0, name="to_rgb")(h)


class MappingNetwork(nn.Module):
    """model.py:189-218: shared 4-layer MLP + per-domain 4-layer heads."""

    latent_dim: int = 16
    style_dim: int = 64
    num_domains: int = 2

    @nn.compact
    def __call__(self, z, y):
        h = nn.relu(_Dense(512, name="shared_0")(z))
        for i in range(3):
            h = nn.relu(_Dense(512, name=f"shared_{i + 1}")(h))
        outs = []
        for d in range(self.num_domains):
            hd = h
            for i in range(3):
                hd = nn.relu(_Dense(512, name=f"unshared_{d}_{i}")(hd))
            outs.append(_Dense(self.style_dim, name=f"unshared_{d}_3")(hd))
        out = jnp.stack(outs, axis=1)  # (B, num_domains, style_dim)
        return jnp.take_along_axis(
            out, y[:, None, None].astype(jnp.int32), axis=1, mode="clip"
        )[:, 0]


class StyleEncoder(nn.Module):
    """model.py:221-252."""

    img_size: int = 256
    style_dim: int = 64
    num_domains: int = 2
    max_conv_dim: int = 512

    @nn.compact
    def __call__(self, x, y):
        dim_in = 2 ** 14 // self.img_size
        h = _Conv(dim_in, 3, name="from_rgb")(x)
        repeat_num = int(np.log2(self.img_size)) - 2
        dim = dim_in
        for i in range(repeat_num):
            dim = min(dim * 2, self.max_conv_dim)
            h = ResBlk(dim, downsample=True, name=f"block_{i}")(h)
        h = nn.leaky_relu(h, 0.2)
        h = _Conv(dim, 4, pad=0, name="conv_out")(h)
        h = nn.leaky_relu(h, 0.2)
        h = h.reshape(h.shape[0], -1)
        outs = [
            _Dense(self.style_dim, name=f"unshared_{d}")(h)
            for d in range(self.num_domains)
        ]
        out = jnp.stack(outs, axis=1)
        return jnp.take_along_axis(
            out, y[:, None, None].astype(jnp.int32), axis=1, mode="clip"
        )[:, 0]


class Discriminator(nn.Module):
    """model.py:255-279: multi-domain real/fake logits; returns the logit of
    the queried domain per sample."""

    img_size: int = 256
    num_domains: int = 2
    max_conv_dim: int = 512

    @nn.compact
    def __call__(self, x, y):
        dim_in = 2 ** 14 // self.img_size
        h = _Conv(dim_in, 3, name="from_rgb")(x)
        repeat_num = int(np.log2(self.img_size)) - 2
        dim = dim_in
        for i in range(repeat_num):
            dim = min(dim * 2, self.max_conv_dim)
            h = ResBlk(dim, downsample=True, name=f"block_{i}")(h)
        h = nn.leaky_relu(h, 0.2)
        h = _Conv(dim, 4, pad=0, name="conv_out")(h)
        h = nn.leaky_relu(h, 0.2)
        h = _Conv(self.num_domains, 1, pad=0, name="head")(h)
        out = h.reshape(h.shape[0], -1)  # (B, num_domains) at 4×4→1×1
        return jnp.take_along_axis(
            out, y[:, None].astype(jnp.int32), axis=1, mode="clip"
        )[:, 0]


def _sg2_t2j(w):
    import numpy as np

    try:
        w = w.detach().cpu().numpy()
    except AttributeError:
        w = np.asarray(w)
    if w.ndim == 4:  # conv (O, I, kh, kw) → (kh, kw, I, O)
        w = w.transpose(2, 3, 1, 0)
    elif w.ndim == 2:  # linear (out, in) → (in, out)
        w = w.transpose(1, 0)
    return w


def _put(tree, path, leaf, value):
    node = tree
    for p in path:
        node = node.setdefault(p, {})
    node[leaf] = value


def _conv_leaf(torch_leaf):
    return "kernel" if torch_leaf == "weight" else "bias"


def _resblk_put(out, scope, rest, val):
    """Map a reference ResBlk sub-key (conv1/conv2/norm1/norm2/conv1x1,
    model.py:23-64) into the vst ResBlk scope."""
    if rest[0] in ("conv1", "conv2", "conv1x1"):
        _put(out, [scope, rest[0], "Conv_0"], _conv_leaf(rest[1]),
             _sg2_t2j(val))
    elif rest[0] in ("norm1", "norm2"):
        _put(out, [scope, rest[0]],
             "scale" if rest[1] == "weight" else "bias", _sg2_t2j(val))
    else:
        raise KeyError(f"unmapped ResBlk key {scope}.{'.'.join(rest)}")


def _adainblk_put(out, scope, rest, val):
    """Map a reference AdainResBlk sub-key (conv1/conv2/conv1x1/norm{1,2}.fc,
    model.py:80-117) into the vst AdainResBlk scope."""
    if rest[0] in ("conv1", "conv2", "conv1x1"):
        _put(out, [scope, rest[0], "Conv_0"], _conv_leaf(rest[1]),
             _sg2_t2j(val))
    elif rest[0] in ("norm1", "norm2"):
        assert rest[1] == "fc"
        _put(out, [scope, rest[0], "fc", "Dense_0"],
             "kernel" if rest[2] == "weight" else "bias", _sg2_t2j(val))
    else:
        raise KeyError(f"unmapped AdainResBlk key {scope}.{'.'.join(rest)}")


def generator_params_from_torch(sd: dict, img_size: int = 256,
                                w_hpf: int = 0) -> dict:
    """Torch StarGAN-v2 Generator state dict (model.py:135-186) → vst tree.

    The reference builds ``decode`` as a stack (insert(0), model.py:152-165):
    decode[0..1] are the bottleneck AdainResBlks and decode[2+i] the
    upsampling ones in reverse-encoder order — exactly the order the vst
    Generator names decode_{i}, so indices map 1:1."""
    out: dict = {}
    for key, val in sd.items():
        k = key[len("module."):] if key.startswith("module.") else key
        parts = k.split(".")
        if parts[0] == "from_rgb":
            _put(out, ["from_rgb", "Conv_0"], _conv_leaf(parts[1]),
                 _sg2_t2j(val))
        elif parts[0] == "encode":
            _resblk_put(out, f"encode_{int(parts[1])}", parts[2:], val)
        elif parts[0] == "decode":
            _adainblk_put(out, f"decode_{int(parts[1])}", parts[2:], val)
        elif parts[0] == "to_rgb":
            if parts[1] == "0":  # InstanceNorm2d(affine=True)
                _put(out, ["to_rgb_norm"],
                     "scale" if parts[2] == "weight" else "bias",
                     _sg2_t2j(val))
            elif parts[1] == "2":  # 1×1 conv
                _put(out, ["to_rgb", "Conv_0"], _conv_leaf(parts[2]),
                     _sg2_t2j(val))
            else:
                raise KeyError(f"unmapped key {key}")
        elif parts[0] == "hpf":
            continue  # fixed Laplacian buffer, not a parameter
        else:
            raise KeyError(f"unmapped key {key}")
    return out


def mapping_params_from_torch(sd: dict) -> dict:
    """Torch MappingNetwork state dict (model.py:189-218) → vst tree.
    shared.{0,2,4,6} are the Linear layers (odd indices are ReLUs);
    unshared.{d}.{0,2,4,6} likewise."""
    out: dict = {}
    for key, val in sd.items():
        k = key[len("module."):] if key.startswith("module.") else key
        parts = k.split(".")
        if parts[0] == "shared":
            i = int(parts[1]) // 2
            _put(out, [f"shared_{i}", "Dense_0"],
                 "kernel" if parts[2] == "weight" else "bias", _sg2_t2j(val))
        elif parts[0] == "unshared":
            d, i = int(parts[1]), int(parts[2]) // 2
            _put(out, [f"unshared_{d}_{i}", "Dense_0"],
                 "kernel" if parts[3] == "weight" else "bias", _sg2_t2j(val))
        else:
            raise KeyError(f"unmapped key {key}")
    return out


def style_encoder_params_from_torch(sd: dict, img_size: int = 256) -> dict:
    """Torch StyleEncoder state dict (model.py:221-252) → vst tree.
    shared.0 = from_rgb conv, shared.{1..rep} = ResBlks, shared.{rep+2} =
    the 4×4 conv_out (rep+1 and rep+3 are LeakyReLUs)."""
    repeat_num = int(np.log2(img_size)) - 2
    out: dict = {}
    for key, val in sd.items():
        k = key[len("module."):] if key.startswith("module.") else key
        parts = k.split(".")
        if parts[0] == "shared":
            i = int(parts[1])
            if i == 0:
                _put(out, ["from_rgb", "Conv_0"], _conv_leaf(parts[2]),
                     _sg2_t2j(val))
            elif 1 <= i <= repeat_num:
                _resblk_put(out, f"block_{i - 1}", parts[2:], val)
            elif i == repeat_num + 2:
                _put(out, ["conv_out", "Conv_0"], _conv_leaf(parts[2]),
                     _sg2_t2j(val))
            else:
                raise KeyError(f"unmapped key {key}")
        elif parts[0] == "unshared":
            _put(out, [f"unshared_{int(parts[1])}", "Dense_0"],
                 "kernel" if parts[2] == "weight" else "bias", _sg2_t2j(val))
        else:
            raise KeyError(f"unmapped key {key}")
    return out


def discriminator_params_from_torch(sd: dict, img_size: int = 256) -> dict:
    """Torch Discriminator state dict (model.py:255-279) → vst tree.
    main.0 = from_rgb, main.{1..rep} = ResBlks, main.{rep+2} = 4×4 conv_out,
    main.{rep+4} = 1×1 domain head."""
    repeat_num = int(np.log2(img_size)) - 2
    out: dict = {}
    for key, val in sd.items():
        k = key[len("module."):] if key.startswith("module.") else key
        parts = k.split(".")
        assert parts[0] == "main", f"unmapped key {key}"
        i = int(parts[1])
        if i == 0:
            _put(out, ["from_rgb", "Conv_0"], _conv_leaf(parts[2]),
                 _sg2_t2j(val))
        elif 1 <= i <= repeat_num:
            _resblk_put(out, f"block_{i - 1}", parts[2:], val)
        elif i == repeat_num + 2:
            _put(out, ["conv_out", "Conv_0"], _conv_leaf(parts[2]),
                 _sg2_t2j(val))
        elif i == repeat_num + 4:
            _put(out, ["head", "Conv_0"], _conv_leaf(parts[2]), _sg2_t2j(val))
        else:
            raise KeyError(f"unmapped key {key}")
    return out
