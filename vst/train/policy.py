"""Mixed-precision compute policy for the GAN trainers.

The reference trains the GAN families in full f32 on CUDA; on TPU the MXU
runs bf16 natively, so the vst trainers support an optional compute dtype
following the RAFT ``encoder_dtype`` pattern (vst/flow/raft.py:380):
master params and optimizer state stay f32, the loss function casts the
param tree and image inputs to bf16 on entry (grads flow back through the
cast and arrive f32 at the optimizer — standard mixed precision), while
norm statistics (vst.nn.norm.instance_norm accumulates in f32 regardless
of activation dtype) and the final loss reductions stay f32.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


_ALIASES = {"bf16": "bfloat16", "f32": "float32", "fp32": "float32",
            "f16": "float16", "fp16": "float16"}


def compute_dtype_of(name: Optional[str]):
    """Config string → jnp dtype (None = full f32, the reference policy).
    Accepts the common short aliases (bf16, f32, ...)."""
    if not name:
        return None
    return jnp.dtype(_ALIASES.get(name, name))


def cast_tree(tree, dtype):
    """Cast f32 leaves of a param tree to the compute dtype (no-op if None).
    Non-f32 leaves (ints, counters) pass through untouched."""
    if dtype is None:
        return tree
    return jax.tree.map(
        lambda v: v.astype(dtype) if v.dtype == jnp.float32 else v, tree)


def cast_img(x, dtype):
    """Cast an image/latent input to the compute dtype (no-op if None)."""
    return x if dtype is None else x.astype(dtype)


def f32(x):
    """Loss-site upcast: reductions (means, norms) accumulate in f32."""
    return x.astype(jnp.float32)
