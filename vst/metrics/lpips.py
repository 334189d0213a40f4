"""LPIPS — parity with ``utils/metrics/lpips.py``.

AlexNet post-ReLU feature maps, per-pixel unit-normalized over channels,
squared difference weighted by learned 1×1 convs, spatial+channel mean,
summed over the 5 taps. Inputs in [−1, 1]; the reference shifts by
μ=(−0.03, −0.088, −0.188), σ=(0.458, 0.448, 0.450) (:58-60).

The learned 1×1 weights are converted from the reference's vendored
``lpips_weights.ckpt`` (binary asset, shipped with every method copy) into
``vst/metrics/data/lpips_lin.npz``. The AlexNet backbone uses torchvision
weights when supplied (not bundled in this environment) and a fixed seed
otherwise — values then differ from the reference, mechanics are identical.
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

_LIN_PATH = os.path.join(os.path.dirname(__file__), "data", "lpips_lin.npz")

MU = (-0.03, -0.088, -0.188)
SIGMA = (0.458, 0.448, 0.450)

ALEX_CHANNELS = (64, 192, 384, 256, 256)


class AlexNetFeatures(nn.Module):
    """torchvision alexnet.features, returning the 5 post-ReLU maps
    (lpips.py:20-33)."""

    @nn.compact
    def __call__(self, x):
        taps = []
        # (features idx) 0: conv 11×11 s4 p2 → 1: relu → 2: maxpool3 s2
        x = nn.Conv(64, (11, 11), strides=(4, 4), padding=((2, 2), (2, 2)),
                    name="conv0")(x)
        x = nn.relu(x)
        taps.append(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = nn.Conv(192, (5, 5), padding=((2, 2), (2, 2)), name="conv3")(x)
        x = nn.relu(x)
        taps.append(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = nn.Conv(384, (3, 3), padding=((1, 1), (1, 1)), name="conv6")(x)
        x = nn.relu(x)
        taps.append(x)
        x = nn.Conv(256, (3, 3), padding=((1, 1), (1, 1)), name="conv8")(x)
        x = nn.relu(x)
        taps.append(x)
        x = nn.Conv(256, (3, 3), padding=((1, 1), (1, 1)), name="conv10")(x)
        x = nn.relu(x)
        taps.append(x)
        return taps


def alexnet_params_from_torch(sd: dict) -> dict:
    """torchvision alexnet state dict (``features.{i}.weight/bias``)."""

    def _np(t):
        try:
            return t.detach().cpu().numpy()
        except AttributeError:
            return np.asarray(t)

    out = {}
    for i in (0, 3, 6, 8, 10):
        out[f"conv{i}"] = {
            "kernel": np.transpose(_np(sd[f"features.{i}.weight"]), (2, 3, 1, 0)),
            "bias": _np(sd[f"features.{i}.bias"]),
        }
    return out


def load_lin_weights(path: Optional[str] = None) -> List[np.ndarray]:
    """The 5 learned (C,) weight vectors (squeezed 1×1 convs)."""
    path = path or _LIN_PATH
    if os.path.exists(path):
        data = np.load(path)
        return [data[f"w{i}"] for i in range(5)]
    # fallback: uniform weights (documented non-parity)
    return [np.full((c,), 1.0 / c, np.float32) for c in ALEX_CHANNELS]


def convert_lin_weights_from_ckpt(ckpt_path: str, out_path: Optional[str] = None):
    """One-time conversion of the reference's lpips_weights.ckpt
    (keys ``lpips_weights.{i}.main.1.weight`` shaped (1, C, 1, 1))."""
    import torch

    sd = torch.load(ckpt_path, map_location="cpu")
    out_path = out_path or _LIN_PATH
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    ws = {}
    for i in range(5):
        w = sd[f"lpips_weights.{i}.main.1.weight"].detach().numpy()
        ws[f"w{i}"] = w.reshape(-1).astype(np.float32)
    np.savez(out_path, **ws)
    return out_path


def _unit_normalize(x, eps=1e-10):
    return x * jax.lax.rsqrt(jnp.sum(x ** 2, axis=-1, keepdims=True) + eps)


class LPIPS:
    """Bound metric: lpips(x, y) over [−1, 1] NHWC images."""

    def __init__(self, alexnet_sd: Optional[dict] = None,
                 lin_path: Optional[str] = None, seed: int = 0):
        self.net = AlexNetFeatures()
        if alexnet_sd is not None:
            self.params = alexnet_params_from_torch(alexnet_sd)
            self.backbone = "torchvision-alexnet"
        else:
            dummy = jnp.zeros((1, 64, 64, 3), jnp.float32)
            self.params = self.net.init(jax.random.PRNGKey(seed), dummy)["params"]
            from vst.perceptual.vgg import he_randomized_params

            # torch-default init vanishes features at depth (random trunk
            # maps every image to ~identical activations -> FID/LPIPS
            # degenerate); He-scaled random features stay discriminative
            self.params = he_randomized_params(self.params, seed)
            # no-egress environment: pipeline-test numbers only (the lin
            # head weights ARE the converted reference lpips_weights.ckpt)
            self.backbone = "random-he"
        self.lin = [jnp.asarray(w) for w in load_lin_weights(lin_path)]

        def fn(params, lin, x, y):
            mu = jnp.asarray(MU, x.dtype)
            sigma = jnp.asarray(SIGMA, x.dtype)
            x = (x - mu) / sigma
            y = (y - mu) / sigma
            fx = self.net.apply({"params": params}, x)
            fy = self.net.apply({"params": params}, y)
            val = 0.0
            for a, b, w in zip(fx, fy, lin):
                a = _unit_normalize(a)
                b = _unit_normalize(b)
                # conv1x1 with weight w then mean ≡ mean over HW of Σ_c w_c·d²
                d = (a - b) ** 2
                val += jnp.mean(jnp.sum(d * w, axis=-1))
            return val

        self._fn = jax.jit(fn)

    def __call__(self, x, y) -> float:
        return float(self._fn(self.params, self.lin, jnp.asarray(x), jnp.asarray(y)))


def lpips_pairwise(lpips: LPIPS, group_of_images: Sequence) -> float:
    """calculate_lpips_given_images parity (:85-98): mean pairwise distance
    over the group."""
    vals = []
    n = len(group_of_images)
    for i in range(n - 1):
        for j in range(i + 1, n):
            vals.append(lpips(group_of_images[i], group_of_images[j]))
    return float(np.mean(vals))
