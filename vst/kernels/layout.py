"""Space-to-depth / subpixel layout helpers consumed by the production
conv paths (vst.nn.conv, vst.kernels.s2d_conv).

The round-2/3 generalization that kept a WHOLE network s2d-resident
(s2d_conv_general + phase-space instance norm / reflect pad / upsample,
consumed by the bench-only faststyle_fast/b1 forwards) was removed in
round 4: three rounds of on-chip probes showed the layout-propagated
forward losing to XLA's natural lowering at every production shape
(BENCH_r03 paths: f32_b1_fast 17.7 ms vs natural 8.0), so per VERDICT r3
item 2 only the probe-verified winners remain:

* ``up2_conv_subpixel``: the decoder up2 stage computed entirely at the
  coarse resolution (exact fold of nearest-up2 ∘ reflect-pad ∘ conv3×3).
* ``s2d_via_conv`` / ``d2s_via_conv``: layout passes as identity convs,
  feeding vst.kernels.s2d_conv's large-kernel stem fast path.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp


def s2d(x: jnp.ndarray, f: int) -> jnp.ndarray:
    """T(B, H, W, C) → S_f(B, H/f, W/f, f²·C). H, W must divide f."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // f, f, W // f, f, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(B, H // f, W // f, f * f * C)


def d2s(x: jnp.ndarray, f: int, C: int) -> jnp.ndarray:
    """S_f(B, Hs, Ws, f²·C) → T(B, f·Hs, f·Ws, C)."""
    B, Hs, Ws, _ = x.shape
    x = x.reshape(B, Hs, Ws, f, f, C).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, f * Hs, f * Ws, C)


def fold_up2_kernel(w: jnp.ndarray) -> jnp.ndarray:
    """Fold a 3×3 kernel meant for a nearest-up2'd input into per-phase
    3×3 kernels over the COARSE grid: (3, 3, Ci, Co) → (3, 3, Ci, 4·Co),
    output channel order = d2s phase order (i·2+j)·Co + c.

    Nearest-up2 duplicates each coarse pixel, so the three fine taps of a
    3×3 conv land on at most two coarse pixels per axis; per output phase
    the duplicated taps sum. Phase 0 touches coarse offsets {−1, 0}
    (weights [w0, w1+w2]), phase 1 touches {0, +1} ([w0+w1, w2]); the
    unused offset keeps a zero row/col so ONE VALID conv over an edge-padded
    coarse input serves all four phases.
    """
    z = jnp.zeros_like(w[0])
    r0 = jnp.stack([w[0], w[1] + w[2], z], 0)          # row phase 0
    r1 = jnp.stack([z, w[0] + w[1], w[2]], 0)          # row phase 1

    def cols(r):
        zc = jnp.zeros_like(r[:, 0])
        c0 = jnp.stack([r[:, 0], r[:, 1] + r[:, 2], zc], 1)
        c1 = jnp.stack([zc, r[:, 0] + r[:, 1], r[:, 2]], 1)
        return c0, c1

    k00, k01 = cols(r0)
    k10, k11 = cols(r1)
    return jnp.concatenate([k00, k01, k10, k11], axis=-1)


def up2_conv_subpixel(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """EXACT replacement for reflect_pad(1) ∘ conv3×3 ∘ nearest_up2 — the
    FastStyleNet decoder stage (network.py:173-191) — computed entirely at
    the coarse resolution: conv with the folded per-phase kernels, then
    depth-to-space. Identical math (reflect pad on the fine grid reduces to
    EDGE pad on the coarse grid: fine[−1] = fine[1] = x[0]); no 4×
    upsampled intermediate ever exists, and the matmul N-dim is 4·Co.

    x: (B, h, w, Ci); w: (3, 3, Ci, Co) → (B, 2h, 2w, Co).
    """
    co = w.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    y = jax.lax.conv_general_dilated(
        xp, fold_up2_kernel(w).astype(x.dtype), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return d2s(y, 2, co)


def up2_conv_subpixel4(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Same math as ``up2_conv_subpixel`` with EXACT FLOPs (16/36 of the
    folded-3×3 form): each output phase's folded kernel has a 2×2 support,
    so run four 2×2 VALID convs over shifted views of the edge-padded coarse
    input and depth-to-space the concatenated phases."""
    co = w.shape[-1]
    # row folds: phase0 [w0, w1+w2], phase1 [w0+w1, w2]; same per column
    r0 = jnp.stack([w[0], w[1] + w[2]], 0)
    r1 = jnp.stack([w[0] + w[1], w[2]], 0)

    def cols(r):
        return (jnp.stack([r[:, 0], r[:, 1] + r[:, 2]], 1),
                jnp.stack([r[:, 0] + r[:, 1], r[:, 2]], 1))

    k00, k01 = cols(r0)
    k10, k11 = cols(r1)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    h, wd = x.shape[1], x.shape[2]

    def c(v, k):
        return jax.lax.conv_general_dilated(
            v, k.astype(x.dtype), (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    y00 = c(xp[:, :-1, :-1], k00)[:, :h, :wd]
    y01 = c(xp[:, :-1, 1:], k01)[:, :h, :wd]
    y10 = c(xp[:, 1:, :-1], k10)[:, :h, :wd]
    y11 = c(xp[:, 1:, 1:], k11)[:, :h, :wd]
    return d2s(jnp.concatenate([y00, y01, y10, y11], axis=-1), 2, co)


@functools.lru_cache(maxsize=None)
def _s2d_id_weights(f: int, C: int):
    """(f, f, C, f²·C) one-hot kernel: tap (a, b, c) → channel (a·f+b)·C+c.
    Cached as a numpy constant so jit folds it once."""
    w = np.zeros((f, f, C, f * f * C), np.float32)
    for a in range(f):
        for b in range(f):
            for c in range(C):
                w[a, b, c, (a * f + b) * C + c] = 1.0
    return w


def s2d_via_conv(x: jnp.ndarray, f: int) -> jnp.ndarray:
    """s2d as a stride-f identity "patchify" conv (ViT-stem shape): XLA
    lowers the reshape∘transpose∘reshape relayout (``s2d``) as an HBM
    gather (~0.8 ms at the stem shape, scripts/bisect_stages.py); the
    identity conv is one MXU matmul bounded by read+write bandwidth."""
    C = x.shape[-1]
    w = jnp.asarray(_s2d_id_weights(f, C), x.dtype)
    return jax.lax.conv_general_dilated(
        x, w, (f, f), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))


def d2s_via_conv(x: jnp.ndarray, f: int, C: int) -> jnp.ndarray:
    """d2s (pixel-shuffle) as a stride-f identity transposed conv — the
    adjoint of :func:`s2d_via_conv`, same rationale."""
    w = jnp.asarray(_s2d_id_weights(f, C), x.dtype)  # (f, f, C, f²C)
    # conv_transpose with the (f, f, C, f²C) kernel read in reverse:
    # out[b, i·f+a, j·f+p, c] = x[b, i, j, (a·f+p)·C+c]
    return jax.lax.conv_transpose(
        x, w.transpose(0, 1, 3, 2), (f, f), "VALID",
        dimension_numbers=("NHWC", "HWOI", "NHWC"),
        transpose_kernel=True)
