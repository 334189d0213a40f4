"""FID — parity with ``utils/metrics/fid.py``.

InceptionV3-pool3 activations → per-set mean/covariance → Fréchet distance
with SciPy's matrix sqrt on the host (:56-59; sqrtm is eval-time-only so it
stays off-device, SURVEY §2.6).
"""

from __future__ import annotations

from typing import Callable, Iterable, Optional

import numpy as np
import jax
import jax.numpy as jnp
from scipy import linalg

from vst.metrics.inception import InceptionV3Trunk, inception_params_from_torch


class InceptionV3:
    """Bound feature extractor: seeded init or converted torchvision weights."""

    def __init__(self, torch_state_dict: Optional[dict] = None, seed: int = 0):
        self.net = InceptionV3Trunk()
        if torch_state_dict is not None:
            self.params = inception_params_from_torch(torch_state_dict)
        else:
            dummy = jnp.zeros((1, 75, 75, 3), jnp.float32)
            self.params = self.net.init(jax.random.PRNGKey(seed), dummy)["params"]
        self._apply = jax.jit(
            lambda p, x: self.net.apply({"params": p}, x)
        )

    def __call__(self, images: jnp.ndarray) -> np.ndarray:
        """images: (B, H, W, 3) in the eval pipeline's range."""
        return np.asarray(self._apply(self.params, images))


def frechet_distance(mu, cov, mu2, cov2) -> float:
    """fid.py:56-59."""
    cc, _ = linalg.sqrtm(np.dot(cov, cov2), disp=False)
    dist = np.sum((mu - mu2) ** 2) + np.trace(cov + cov2 - 2 * cc)
    return float(np.real(dist))


def activation_stats(actvs: np.ndarray):
    return np.mean(actvs, axis=0), np.cov(actvs, rowvar=False)


def fid_from_activations(actvs1: np.ndarray, actvs2: np.ndarray) -> float:
    mu1, cov1 = activation_stats(actvs1)
    mu2, cov2 = activation_stats(actvs2)
    return frechet_distance(mu1, cov1, mu2, cov2)


def fid_from_image_batches(
    inception: InceptionV3,
    batches1: Iterable[np.ndarray],
    batches2: Iterable[np.ndarray],
) -> float:
    """calculate_fid_given_paths parity (:62-79) with in-memory batch
    iterables instead of directory loaders."""
    actvs = []
    for batches in (batches1, batches2):
        a = [inception(jnp.asarray(b)) for b in batches]
        actvs.append(np.concatenate(a, axis=0))
    return fid_from_activations(actvs[0], actvs[1])
