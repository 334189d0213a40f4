"""VGG feature extractors (NHWC, flax.linen) + torch weight conversion.

Three variants used by the reference:

* ``Vgg16Features`` — torchvision vgg16 slices returning
  (relu1_2, relu2_2, relu3_3, relu4_3); parity with
  ``methods/learning-based/network.py:10-43``.
* ``Vgg19Features`` — torchvision vgg19 slices returning
  (relu1_1, relu2_1, relu3_1, relu4_1, relu5_1); parity with
  ``network.py:45-78``.
* ``CaffeVGG`` — the OBST truncated caffe-layout VGG19 (conv1_1…conv5_1,
  named-output dict, max or avg pooling); parity with
  ``methods/optimization-based/obst_eval.py:164-220``.

Pretrained weights: torchvision is not bundled in this environment; these
modules accept converted torch state dicts via ``*_params_from_torch`` when a
``.pth`` is supplied, and otherwise initialize from a fixed seed (documented
non-parity: perceptual-loss *values* then differ from the reference, but all
shapes, graphs and training mechanics are identical).
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import numpy as np
import jax.numpy as jnp
import flax.linen as nn

from vst.nn.conv import TorchConv

# torchvision `features` configs: ints are conv output channels, 'M' = maxpool.
VGG16_CFG = (64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
             512, 512, 512, "M", 512, 512, 512, "M")
VGG19_CFG = (64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
             512, 512, 512, 512, "M", 512, 512, 512, 512, "M")


def _max_pool(x):
    return nn.max_pool(x, (2, 2), strides=(2, 2))


class _VggTrunk(nn.Module):
    """Runs a torchvision-style cfg, returning post-ReLU taps by feature
    index. Convs are named ``conv{i}`` with i = torchvision features index,
    so state-dict conversion is mechanical."""

    cfg: Tuple
    taps: Tuple[int, ...]  # torchvision feature indices of the ReLUs to tap

    @nn.compact
    def __call__(self, x) -> Tuple[jnp.ndarray, ...]:
        outs = []
        idx = 0
        last_tap = max(self.taps)
        for c in self.cfg:
            if idx > last_tap:
                break
            if c == "M":
                x = _max_pool(x)
                idx += 1
            else:
                x = TorchConv(c, 3, padding=1, name=f"conv{idx}")(x)
                idx += 1  # idx is now the ReLU's feature position
                x = nn.relu(x)
                if idx in self.taps:
                    outs.append(x)
                idx += 1
        return tuple(outs)


class Vgg16Features(nn.Module):
    """relu1_2, relu2_2, relu3_3, relu4_3 (torchvision vgg16.features ReLU
    indices 3, 8, 15, 22)."""

    @nn.compact
    def __call__(self, x):
        return _VggTrunk(VGG16_CFG, taps=(3, 8, 15, 22), name="trunk")(x)


class Vgg19Features(nn.Module):
    """relu1_1, relu2_1, relu3_1, relu4_1, relu5_1 (torchvision
    vgg19.features ReLU indices 1, 6, 11, 20, 29)."""

    @nn.compact
    def __call__(self, x):
        return _VggTrunk(VGG19_CFG, taps=(1, 6, 11, 20, 29), name="trunk")(x)


class CaffeVGG(nn.Module):
    """OBST VGG: named outputs r11…r51 / p1…p4, truncated after conv5_1.

    Input is caffe-preprocessed BGR pixels in [0,255]-ish range (see
    ``obst_prep``). ``pool='max'`` is the reference default.
    """

    pool: str = "max"

    @nn.compact
    def __call__(self, x, out_keys: Sequence[str]):
        if self.pool == "max":
            pool = _max_pool
        else:
            from vst.ops.image import avg_pool2d

            pool = avg_pool2d

        cfg = [
            ("conv1_1", 64), ("conv1_2", 64), ("p1", None),
            ("conv2_1", 128), ("conv2_2", 128), ("p2", None),
            ("conv3_1", 256), ("conv3_2", 256), ("conv3_3", 256),
            ("conv3_4", 256), ("p3", None),
            ("conv4_1", 512), ("conv4_2", 512), ("conv4_3", 512),
            ("conv4_4", 512), ("p4", None),
            ("conv5_1", 512),
        ]
        out: Dict[str, jnp.ndarray] = {}
        h = x
        for name, ch in cfg:
            if ch is None:
                h = pool(h)
                out[name] = h
            else:
                h = nn.relu(TorchConv(ch, 3, padding=1, name=name)(h))
                out["r" + name[4] + name[6]] = h
        return [out[k] for k in out_keys]


# ---------------------------------------------------------------------------
# torch state-dict conversion
# ---------------------------------------------------------------------------

def _t2j_conv_w(w: np.ndarray) -> np.ndarray:
    """torch conv weight (O, I, kh, kw) → flax (kh, kw, I, O)."""
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def _as_np(t):
    try:
        return t.detach().cpu().numpy()
    except AttributeError:
        return np.asarray(t)


def _trunk_params_from_torch(sd: dict, conv_indices: Sequence[int]) -> dict:
    """Map torchvision `features.{i}.weight/bias` to our trunk conv{i}."""
    trunk = {}
    for i in conv_indices:
        w = _as_np(sd[f"features.{i}.weight"])
        b = _as_np(sd[f"features.{i}.bias"])
        trunk[f"conv{i}"] = {"Conv_0": {"kernel": _t2j_conv_w(w), "bias": b}}
    return {"trunk": trunk}


def vgg16_params_from_torch(sd: dict) -> dict:
    """Convert a torchvision vgg16 state dict (only the slices up to
    relu4_3 are needed: conv feature indices 0…21)."""
    return _trunk_params_from_torch(sd, (0, 2, 5, 7, 10, 12, 14, 17, 19, 21))


def vgg19_params_from_torch(sd: dict) -> dict:
    return _trunk_params_from_torch(
        sd, (0, 2, 5, 7, 10, 12, 14, 16, 19, 21, 23, 25, 28)
    )


def caffe_vgg_params_from_torch(sd: dict) -> dict:
    """Convert the OBST ``vgg_conv.pth`` (keys ``conv1_1.weight`` …) with
    conv5_2+ already deleted (``obst_eval.py:246-253``)."""
    params = {}
    for key in sd:
        if key.endswith(".weight"):
            name = key[: -len(".weight")]
            params[name] = {
                "Conv_0": {
                    "kernel": _t2j_conv_w(_as_np(sd[key])),
                    "bias": _as_np(sd[name + ".bias"]),
                }
            }
    return params


# ---------------------------------------------------------------------------
# OBST caffe pre/post-processing — parity with obst_eval.py:306-322, 431-441
# ---------------------------------------------------------------------------

CAFFE_MEAN_BGR = (0.40760392, 0.45795686, 0.48501961)


def obst_prep(img: jnp.ndarray) -> jnp.ndarray:
    """RGB [0,1] NHWC → BGR, mean-subtracted, ×255 (resize handled by the
    caller to keep this jit-pure)."""
    bgr = img[..., ::-1]
    mean = jnp.asarray(CAFFE_MEAN_BGR, dtype=img.dtype)
    return (bgr - mean) * 255.0


def obst_postp(x: jnp.ndarray) -> jnp.ndarray:
    """Inverse of obst_prep with [0,1] clipping (postpa + clip;
    PIL resize/grayscale steps are host-side in vst.eval)."""
    x = x / 255.0
    mean = jnp.asarray(CAFFE_MEAN_BGR, dtype=x.dtype)
    x = x + mean
    x = jnp.clip(x, 0.0, 1.0)
    return x[..., ::-1]


def he_randomized_params(params: dict, seed: int = 0) -> dict:
    """Re-draw every conv kernel He-normal (fan_in, gain √2) and zero the
    biases. The no-pretrained-weights fallback: torch's default conv init
    (kaiming-uniform, a=√5 → gain ≈ 0.58) SHRINKS activations ~2× per layer,
    so by relu3_3 a 10-layer random VGG maps every image to near-identical
    features — perceptual losses then have zero signal and TV collapses the
    generator to flat gray (observed in the first corpus Johnson run).
    He-scaled random features keep unit variance at depth, which makes
    random-projection Gram/content statistics discriminative (the
    "style transfer with random weights" regime)."""
    import jax

    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    rng = np.random.RandomState(seed)  # host numpy — no per-leaf TPU compiles
    out = {}

    def set_in(tree, path, val):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = val

    for path, leaf in flat:
        names = [p.key for p in path]
        if names[-1] == "kernel" and getattr(leaf, "ndim", 0) == 4:
            kh, kw, ci, co = leaf.shape
            std = np.sqrt(2.0 / (kh * kw * ci))
            val = jnp.asarray((rng.randn(*leaf.shape) * std).astype(np.float32))
        elif names[-1] == "bias":
            val = jnp.asarray(np.zeros(leaf.shape, np.float32))
        else:
            # norm scales / running stats etc. keep their init — zeroing a
            # BatchNorm scale would kill the features outright
            val = leaf
        set_in(out, names, val)
    return out
