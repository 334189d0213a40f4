"""Loss primitives: Gram matrix, total variation, normalization (NHWC)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

# torchvision ImageNet normalization used by the learning-based VGG16 path
# (``fast_style_transfer.py`` VGG16_MEAN/STD and ``normalize`` :819-822).
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def gram_matrix(x: jnp.ndarray) -> jnp.ndarray:
    """Batched Gram matrix, parity with ``fast_style_transfer.py:813-817``:
    features (B, C, H·W); G = F·Fᵀ / (H·W). x is NHWC → (B, C, C)."""
    B, H, W, C = x.shape
    f = x.reshape(B, H * W, C)
    acc = jnp.float64 if x.dtype == jnp.float64 else jnp.float32
    g = jnp.einsum(
        "bnc,bnd->bcd", f, f,
        preferred_element_type=acc,
        precision=jax.lax.Precision.HIGHEST,
    )
    return g / (H * W)


def gram_matrix_obst(x: jnp.ndarray) -> jnp.ndarray:
    """OBST variant, parity with ``obst_eval.py:223-229``: identical math
    (F·Fᵀ/(h·w)); kept separate so call-sites cite their own reference."""
    return gram_matrix(x)


def _safe_sqrt(x: jnp.ndarray) -> jnp.ndarray:
    """sqrt with a ZERO subgradient at x == 0.

    d/dx √x → ∞ as x → 0⁺; when adjacent pixels round to exactly equal
    values (common under TPU bf16 matmuls, rare in f32 — the torch reference
    has the same landmine but seldom steps on it), the training step turns
    NaN — even with a zero loss weight, since 0·∞ = NaN in the chain rule.
    Values are exact (√0 = 0); only the undefined subgradient is chosen as 0.
    """
    nonzero = x > 0
    return jnp.where(nonzero, jnp.sqrt(jnp.where(nonzero, x, 1.0)), 0.0)


def tv_loss(x: jnp.ndarray) -> jnp.ndarray:
    """Total variation, parity with ``fast_style_transfer.py:795-803``
    (``calc_tv_loss``): channelwise-L2 of forward differences, sqrt of the
    sum, summed over all pixels and batch. x: NHWC."""
    sij = x[:, :-1, :-1, :]
    si1j = x[:, 1:, :-1, :]   # +1 in H  (torch dim 2)
    sij1 = x[:, :-1, 1:, :]   # +1 in W  (torch dim 3)
    tv1 = jnp.sum((sij1 - sij) ** 2, axis=-1)
    tv2 = jnp.sum((si1j - sij) ** 2, axis=-1)
    return jnp.sum(_safe_sqrt(tv1 + tv2))


def normalize_imagenet(img: jnp.ndarray) -> jnp.ndarray:
    """(img − mean)/std with torchvision ImageNet stats; img NHWC in [0,1].
    Parity with ``fast_style_transfer.py:819-822``."""
    mean = jnp.asarray(IMAGENET_MEAN, dtype=img.dtype)
    std = jnp.asarray(IMAGENET_STD, dtype=img.dtype)
    return (img - mean) / std
