"""Space-to-depth convolution — exact fast path for large-kernel,
small-channel, stride-1 convs.

XLA lowers a 9×9 stride-1 conv with 3 input / 32 output channels at
436×1024 to an MXU matmul with K=243, N=32 — mostly idle systolic array
(~3.7 ms measured, ~50× off roofline). Rewriting it as an EXACT f×f
space-to-depth decomposition turns it into a ⌈(k+f−1)/f⌉² conv over f²·Ci
input and f²·Co output channels at 1/f resolution (f=4: K=432, N=512 —
proper MXU tiling; measured 1.9 ms, 2× faster, error ≤ 2e-6).

The kernel rearrangement is done with jnp ops inside the traced function, so
the parameter layout is unchanged and gradients flow to the original (k, k,
Ci, Co) weight — drop-in for training and inference.

Derivation: with phases a=(py+dy) mod f, ky=(py+dy) div f (same for x), the
stride-1 conv output at phase (py, px) is a conv over s2d channels (a, b, ci)
with kernel entry w[dy, dx, ci, co] placed at [ky, kx, (a·f+b)·Ci+ci,
(py·f+px)·Co+co].
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp


@functools.lru_cache(maxsize=None)
def _placement_indices(k: int, f: int, ci: int, co: int):
    """Static scatter indices mapping w[dy,dx,ci,co] into the s2d kernel."""
    k2 = (f - 1 + k - 1) // f + 1
    src_dy, src_dx, dst = [], [], []
    for py in range(f):
        for px in range(f):
            for dy in range(k):
                for dx in range(k):
                    a, ky = (py + dy) % f, (py + dy) // f
                    b, kx = (px + dx) % f, (px + dx) // f
                    src_dy.append(dy)
                    src_dx.append(dx)
                    dst.append(((ky * k2 + kx) * (f * f) + (a * f + b),
                                py * f + px))
    return k2, np.asarray(src_dy), np.asarray(src_dx), np.asarray(dst)


def _s2d_weights(w: jnp.ndarray, f: int) -> jnp.ndarray:
    """(k, k, Ci, Co) → (k2, k2, f²·Ci, f²·Co), differentiable."""
    k, _, ci, co = w.shape
    k2, src_dy, src_dx, dst = _placement_indices(k, f, ci, co)
    flat = jnp.zeros((k2 * k2 * f * f, f * f, ci, co), w.dtype)
    entries = w[src_dy, src_dx]  # (n, ci, co)
    flat = flat.at[dst[:, 0], dst[:, 1]].set(entries)
    w2 = flat.reshape(k2, k2, f * f, f * f, ci, co)
    # (k2, k2, (a·f+b), ci) input channel block; ((py·f+px), co) output block
    w2 = w2.transpose(0, 1, 2, 4, 3, 5).reshape(k2, k2, f * f * ci, f * f * co)
    return w2


def s2d_conv2d(x: jnp.ndarray, w: jnp.ndarray, f: int = 4) -> jnp.ndarray:
    """VALID stride-1 conv of pre-padded x (B, Hp, Wp, Ci) with w
    (k, k, Ci, Co) via f×f space-to-depth. Output (B, Hp−k+1, Wp−k+1, Co),
    bitwise-equivalent to lax.conv up to f32 reassociation."""
    B, Hp, Wp, Ci = x.shape
    k, _, _, Co = w.shape
    w = w.astype(x.dtype)
    Ho, Wo = Hp - k + 1, Wp - k + 1
    k2 = (f - 1 + k - 1) // f + 1

    # pad so every phase's window exists: s2d grid needs k2·f ≥ k + f − 1
    # rows/cols beyond each phase offset, and Hp divisible by f
    needH = ((Ho + f - 1) // f + k2 - 1) * f
    needW = ((Wo + f - 1) // f + k2 - 1) * f
    xp = jnp.pad(x, ((0, 0), (0, max(0, needH - Hp)), (0, max(0, needW - Wp)),
                     (0, 0)))
    Hp2, Wp2 = xp.shape[1], xp.shape[2]

    import os

    if os.environ.get("VST_S2D_VIA_CONV") == "1":
        # layout passes as identity convs (MXU, bandwidth-bound) instead
        # of XLA's reshape∘transpose HBM gathers — opt-in pending a TPU
        # A/B (scripts/probe_pallas_tpu.py measures both)
        from vst.kernels.layout import d2s_via_conv, s2d_via_conv

        xs = s2d_via_conv(xp, f)
        y = jax.lax.conv_general_dilated(
            xs, _s2d_weights(w, f), (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return d2s_via_conv(y, f, Co)[:, :Ho, :Wo, :]

    xs = xp.reshape(B, Hp2 // f, f, Wp2 // f, f, Ci)
    xs = xs.transpose(0, 1, 3, 2, 4, 5).reshape(B, Hp2 // f, Wp2 // f, f * f * Ci)

    w2 = _s2d_weights(w, f)
    y = jax.lax.conv_general_dilated(
        xs, w2, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    Hh, Wh = y.shape[1], y.shape[2]
    y = y.reshape(B, Hh, Wh, f, f, Co).transpose(0, 1, 3, 2, 4, 5)
    y = y.reshape(B, f * Hh, f * Wh, Co)
    return y[:, :Ho, :Wo, :]

