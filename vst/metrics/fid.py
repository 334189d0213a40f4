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
            self.backbone = "torchvision-inception"
        else:
            dummy = jnp.zeros((1, 75, 75, 3), jnp.float32)
            self.params = self.net.init(jax.random.PRNGKey(seed), dummy)["params"]
            from vst.perceptual.vgg import he_randomized_params

            # torch-default init vanishes features at depth (random trunk
            # maps every image to ~identical activations -> FID/LPIPS
            # degenerate); He-scaled random features stay discriminative
            self.params = he_randomized_params(self.params, seed)
            # no-egress environment: numbers produced with this trunk are a
            # pipeline test, NOT comparable to reference FID magnitudes
            self.backbone = "random-he"
        self._apply = jax.jit(
            lambda p, x: self.net.apply({"params": p}, x)
        )

    def __call__(self, images: jnp.ndarray, chunk: int = 16) -> np.ndarray:
        """images: (B, H, W, 3) in the eval pipeline's range.

        Runs in fixed-size chunks (last one zero-padded then trimmed) so the
        jitted trunk compiles ONCE regardless of pile size — variable-N
        piles otherwise recompile the whole trunk per distinct N (~40 s on
        CPU), which dominated the FC2 harness."""
        images = jnp.asarray(images)
        n = images.shape[0]
        outs = []
        for i in range(0, n, chunk):
            part = images[i:i + chunk]
            if part.shape[0] < chunk:
                pad = chunk - part.shape[0]
                part = jnp.concatenate(
                    [part, jnp.zeros((pad,) + part.shape[1:], part.dtype)], 0)
            outs.append(np.asarray(self._apply(self.params, part)))
        return np.concatenate(outs, axis=0)[:n]


def frechet_distance(mu, cov, mu2, cov2) -> float:
    """fid.py:56-59."""
    cc = linalg.sqrtm(np.atleast_2d(np.dot(cov, cov2)))
    # scipy <1.18 returns (sqrtm, errest) when disp=False; ≥1.17 without
    # disp returns just the array — normalize both shapes of the API
    if isinstance(cc, tuple):
        cc = cc[0]
    dist = np.sum((mu - mu2) ** 2) + np.trace(cov + cov2 - 2 * cc)
    return float(np.real(dist))


def activation_stats(actvs: np.ndarray):
    return np.mean(actvs, axis=0), np.cov(actvs, rowvar=False)


def fid_from_activations(actvs1: np.ndarray, actvs2: np.ndarray) -> float:
    """Fréchet distance from raw activation piles.

    Equal to ``frechet_distance(activation_stats(...))`` but when both piles
    are smaller than the feature dim it computes the cross term exactly in
    the sample subspace: the nonzero eigenvalues of ``cov1·cov2`` equal
    those of the (n1, n1) matrix ``(X1 X2ᵀ)(X2 X1ᵀ)/((n1−1)(n2−1))`` for
    centered piles Xi, so ``tr √(cov1·cov2) = Σ √λ`` needs no 2048² sqrtm
    (which costs minutes single-core and dominated the FC2 harness)."""
    # random-init trunks on far-out-of-distribution pixels can overflow
    # f32 → inf activations; sanitize so the eigensolver stays stable
    a1 = np.nan_to_num(np.asarray(actvs1, np.float64),
                       nan=0.0, posinf=1e6, neginf=-1e6)
    a2 = np.nan_to_num(np.asarray(actvs2, np.float64),
                       nan=0.0, posinf=1e6, neginf=-1e6)
    n1, d = a1.shape
    n2 = a2.shape[0]
    if min(n1, n2) >= 2 and max(n1, n2) < d:
        mu1, mu2 = a1.mean(0), a2.mean(0)
        x1 = (a1 - mu1) / np.sqrt(n1 - 1)
        x2 = (a2 - mu2) / np.sqrt(n2 - 1)
        cross = x1 @ x2.T          # (n1, n2)
        small = cross @ cross.T    # (n1, n1) — spectrum of cov1·cov2
        ev = np.linalg.eigvalsh((small + small.T) / 2)
        tr_sqrt = np.sum(np.sqrt(np.clip(ev, 0.0, None)))
        tr1 = float(np.sum(x1 * x1))
        tr2 = float(np.sum(x2 * x2))
        return float(np.sum((mu1 - mu2) ** 2) + tr1 + tr2 - 2.0 * tr_sqrt)
    mu1, cov1 = activation_stats(a1)
    mu2, cov2 = activation_stats(a2)
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
