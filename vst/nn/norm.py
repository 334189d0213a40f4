"""Normalization layers (NHWC), torch-parity semantics."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn


def instance_norm(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """Per-sample, per-channel normalization over (H, W).

    Matches torch.nn.InstanceNorm2d (biased variance, eps inside sqrt).
    x: (B, H, W, C).

    Single-pass stats: E[x²] − E[x]² lets XLA fuse both reductions into
    ONE traversal of x with the f32 cast folded in, instead of
    materializing an f32 copy and reading it twice (centered two-pass).
    On-chip A/B at the FastStyleNet trunk shape: 0.62 vs 0.94 ms
    (scripts/bisect_res.py). cuDNN's own batch/instance-norm stats use
    the same formulation; f32 accumulation keeps bf16 activations at
    ~1e-6 relative drift, and variance is clamped at 0 against f32
    cancellation for large-magnitude activations.
    """
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=(1, 2), keepdims=True)
    m2 = jnp.mean(jnp.square(xf), axis=(1, 2), keepdims=True)
    var = jnp.maximum(m2 - jnp.square(mean), 0.0)
    return (((xf - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype))


class InstanceNorm(nn.Module):
    """torch.nn.InstanceNorm2d equivalent.

    affine=True matches the FastStyleNet usage
    (``methods/learning-based/network.py:154``); affine=False matches the
    RAFT encoders (``utils/raft/raft/extractor.py:29-32`` — InstanceNorm2d
    with default affine=False, i.e. no parameters).
    """

    affine: bool = True
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        out = instance_norm(x, self.eps)
        if self.affine:
            c = x.shape[-1]
            scale = self.param("scale", nn.initializers.ones, (c,))
            bias = self.param("bias", nn.initializers.zeros, (c,))
            out = out * scale + bias
        return out


class ConditionalInstanceNorm(nn.Module):
    """Multi-style conditional norm, parity with ``ConditionalBatchNorm2d``
    (``methods/learning-based/network.py:120-145``).

    Despite the name, the reference wraps an affine InstanceNorm2d and then
    applies a per-style (γ, β) looked up from an embedding table:
    γ init N(1, 0.02), β init 0. The reference's ``chunk(2)`` splits dim 0,
    which is only correct for a scalar style id — we take a scalar (or
    0-d array) ``style_id`` and broadcast over the batch, matching the
    reference's only usage pattern.
    """

    num_styles: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray, style_id) -> jnp.ndarray:
        c = x.shape[-1]
        out = instance_norm(x, self.eps)
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        out = out * scale + bias

        def emb_init(key, shape, dtype=jnp.float32):
            g = 1.0 + 0.02 * jax.random.normal(key, (shape[0], c), dtype)
            b = jnp.zeros((shape[0], c), dtype)
            return jnp.concatenate([g, b], axis=1)

        embed = self.param("embed", emb_init, (self.num_styles, 2 * c))
        sid = jnp.asarray(style_id, dtype=jnp.int32)
        # mode="clip": out-of-range style ids clamp to the last style instead
        # of jnp.take's default NaN fill (silent garbage under jit).
        gb = jnp.take(embed, sid, axis=0, mode="clip")  # (2C,)
        gamma, beta = gb[:c], gb[c:]
        return gamma * out + beta


class AdaIN(nn.Module):
    """Adaptive instance norm, parity with StarGAN-v2's AdaIN
    (``StarGANv2Adv/core/model.py:67-77``): InstanceNorm (affine=False) then
    per-sample (1+γ)·x̂ + β from a style-code linear layer.
    """

    num_features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray, s: jnp.ndarray) -> jnp.ndarray:
        from vst.nn.init import dense_kernel_torch_default

        h = nn.Dense(
            self.num_features * 2,
            kernel_init=dense_kernel_torch_default,
        )(s)  # (B, 2C)
        gamma, beta = jnp.split(h, 2, axis=-1)
        out = instance_norm(x, self.eps)
        return (1.0 + gamma[:, None, None, :]) * out + beta[:, None, None, :]
