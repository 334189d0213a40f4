"""Layout-propagated convolution algebra (space-to-depth resident nets).

vst.kernels.s2d_conv showed that ONE conv gets 2× faster by computing in a
space-to-depth layout — but it pays an HBM layout pass on each side. This
module generalizes the rewrite so a WHOLE network can stay s2d-resident:

* ``S_a`` layout of a T(H, W, C) tensor = (H/a, W/a, a²·C) with channel
  index (py·a + px)·C + c ↔ T pixel (a·u + py, a·v + px, c).
* ``s2d_conv_general``: any conv (kernel k, stride s, zero/reflect T-pad p)
  from an S_a input to an S_b output, requiring a = s·b — the kernel is
  re-placed once (cached) into an equivalent small-kernel large-channel conv
  that tiles the MXU properly. Derivation: output T row Y = b·U + py reads
  input T rows a·U + o with o = s·py + dy − p; placing w[dy, dx] at S-kernel
  tap (Ps + ⌊o/a⌋, phase o mod a) reproduces the conv exactly.
* phase-space equivalents of the pointwise stages: instance norm (T-channel
  stats reduce over phases too), reflect padding (phase-permuted row/col
  gathers), nearest 2× upsampling (pure channel duplication — free).

With these, FastStyleNet's stem and head never materialize a full-res
(H, W, 32) tensor: the only layout passes are the tiny 3-channel input s2d
and output d2s.
"""

from __future__ import annotations

import functools
from typing import Tuple

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


@functools.lru_cache(maxsize=None)
def _placement(k: int, a: int, b: int, s: int, p: int):
    """Static placement table for the generalized kernel rewrite."""
    assert a == s * b, f"layout conv requires a == s·b (got a={a}, b={b}, s={s})"
    offs = [s * py + dy - p for py in range(b) for dy in range(k)]
    lo = min(o // a if o >= 0 else -((-o + a - 1) // a) for o in offs)
    hi = max(o // a if o >= 0 else -((-o + a - 1) // a) for o in offs)
    Ps = -lo
    k2 = hi - lo + 1
    entries = []
    for py in range(b):
        for dy in range(k):
            o = s * py + dy - p
            ku = (o + a * Ps) // a
            ay = (o + a * Ps) % a
            entries.append((py, dy, ku, ay))
    return Ps, k2, tuple(entries)


def _general_weights(w: jnp.ndarray, a: int, b: int, s: int, p: int):
    """(k, k, Ci, Co) → (k2, k2, a²·Ci, b²·Co) for S_a → S_b."""
    k, _, ci, co = w.shape
    Ps, k2, entries = _placement(k, a, b, s, p)

    w2 = jnp.zeros((k2, k2, a * a * ci, b * b * co), w.dtype)
    # scatter all (row-entry × col-entry) pairs at once
    idx_ku, idx_kx, idx_cin, idx_cout, src_dy, src_dx = [], [], [], [], [], []
    for (py, dy, ku, ay) in entries:
        for (px, dx, kx, ax) in entries:
            idx_ku.append(ku)
            idx_kx.append(kx)
            idx_cin.append(ay * a + ax)
            idx_cout.append(py * b + px)
            src_dy.append(dy)
            src_dx.append(dx)
    vals = w[jnp.asarray(src_dy), jnp.asarray(src_dx)]  # (n, ci, co)
    n = len(idx_ku)
    ci_block = jnp.asarray(idx_cin)[:, None] * ci + jnp.arange(ci)[None, :]
    co_block = jnp.asarray(idx_cout)[:, None] * co + jnp.arange(co)[None, :]
    w2 = w2.at[
        jnp.asarray(idx_ku)[:, None, None].repeat(ci, 1).repeat(co, 2),
        jnp.asarray(idx_kx)[:, None, None].repeat(ci, 1).repeat(co, 2),
        ci_block[:, :, None].repeat(co, 2),
        co_block[:, None, :].repeat(ci, 1),
    ].add(vals)
    return w2, Ps, k2


def reflect_pad_s2d(x_s: jnp.ndarray, a: int, C: int, pad_t: int,
                    rows_s: Tuple[int, int], cols_s: Tuple[int, int]):
    """Pad an S_a tensor with (rows_s, cols_s) WHOLE S rows/cols on each side
    whose values are the T-space REFLECT padding of the underlying image.
    Any padded T index beyond the reflect range of pad_t is still filled with
    its reflect value (harmless — those taps are never read by a conv whose
    T-pad is pad_t). x_s: (B, Hs, Ws, a²·C)."""
    B, Hs, Ws, _ = x_s.shape

    def pad_axis(x, n_before, n_after, axis_rows: bool):
        if n_before == 0 and n_after == 0:
            return x
        Hcur = x.shape[1] if axis_rows else x.shape[2]
        H_t = Hcur * a
        # source (S row, phase) for each padded T row
        pieces_before, pieces_after = [], []

        def build(side_rows, before: bool):
            out = []
            for r in range(side_rows):
                # padded S row index (negative side counts from −side_rows)
                sr = (-(side_rows - r)) if before else (Hcur + r)
                phases = []
                for ph in range(a):
                    t = sr * a + ph
                    # reflect (torch ReflectionPad): t < 0 → −t; t ≥ H → 2H−2−t
                    tt = t
                    while tt < 0 or tt >= H_t:
                        tt = -tt if tt < 0 else 2 * H_t - 2 - tt
                    s_row, s_ph = tt // a, tt % a
                    if axis_rows:
                        block = jax.lax.dynamic_slice_in_dim(x, s_row, 1, 1)
                        block = block.reshape(B, 1, x.shape[2], a, a * C)
                        phases.append(block[:, :, :, s_ph])
                    else:
                        block = jax.lax.dynamic_slice_in_dim(x, s_row, 1, 2)
                        block = block.reshape(B, x.shape[1], 1, a, a, C)
                        phases.append(block[:, :, :, :, s_ph])  # (B,Hs,1,a,C)
                if axis_rows:
                    row = jnp.concatenate(phases, axis=-1)  # (B,1,Ws,a²C)
                else:
                    # phases[ph] = (B, Hs, 1, a, C) holding all row-phases py
                    # for output column-phase px=ph; channel layout must be
                    # (py·a + px)·C → stack px on the axis AFTER py
                    row = jnp.stack(phases, axis=4).reshape(
                        B, x.shape[1], 1, a * a * C)
                out.append(row)
            return out

        before = build(n_before, True)
        after = build(n_after, False)
        axis = 1 if axis_rows else 2
        return jnp.concatenate(before + [x] + after, axis=axis)

    x_s = pad_axis(x_s, rows_s[0], rows_s[1], True)
    x_s = pad_axis(x_s, cols_s[0], cols_s[1], False)
    return x_s


def s2d_conv_general(
    x_s: jnp.ndarray, w: jnp.ndarray, a: int, stride: int = 1,
    t_pad: int = 0, pad_mode: str = "zero", out_t_hw: Tuple[int, int] = None,
) -> jnp.ndarray:
    """Conv on an S_a input producing an S_b output (b = a // stride).

    x_s: (B, Hs, Ws, a²·Ci) — the S_a layout of T(a·Hs, a·Ws, Ci);
    w: (k, k, Ci, Co) torch-layout kernel; t_pad: symmetric T-space padding.
    Returns the S_b layout of the conv output, cropped to ``out_t_hw`` if
    the natural output size isn't divisible by b.
    """
    k, _, ci, co = w.shape
    b = a // stride
    assert a == stride * b
    w2, Ps, k2 = _general_weights(w, a, b, stride, t_pad)

    B, Hs, Ws, _ = x_s.shape
    H_t, W_t = a * Hs, a * Ws
    Ho_t = (H_t + 2 * t_pad - k) // stride + 1
    Wo_t = (W_t + 2 * t_pad - k) // stride + 1
    Uo = -(-Ho_t // b)
    Vo = -(-Wo_t // b)
    # padded S rows needed: Uo + k2 − 1 total span starting at −Ps
    pad_r_after = max(0, (Uo + k2 - 1 - Ps) - Hs)
    pad_c_after = max(0, (Vo + k2 - 1 - Ps) - Ws)

    if pad_mode == "zero":
        xp = jnp.pad(x_s, ((0, 0), (Ps, pad_r_after), (Ps, pad_c_after),
                           (0, 0)))
    elif pad_mode == "reflect":
        xp = reflect_pad_s2d(x_s, a, ci, t_pad, (Ps, pad_r_after),
                             (Ps, pad_c_after))
    else:
        raise ValueError(pad_mode)

    y = jax.lax.conv_general_dilated(
        xp, w2.astype(x_s.dtype), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    y = y[:, :Uo, :Vo, :]
    return y


def s2d_conv_phase(
    x_s: jnp.ndarray, w: jnp.ndarray, a: int, stride: int = 1,
    t_pad: int = 0, pad_mode: str = "reflect",
) -> jnp.ndarray:
    """Exact-FLOPs conv on an S_a input producing an S_b output (b = a//stride).

    MEASURED (v5e, 436×1024 FastStyleNet): exact FLOPs do NOT win — XLA
    lowers this batched-tiny-conv (batch B·Hs·Ws, spatial (a+2p)²) to
    gather-heavy im2col and it loses to ``s2d_conv_general``'s dense matmul
    everywhere (b1: 13.2 ms vs 9.1 natural; b16: 19.2 vs 5.1 dense). Kept as
    a correct, tested layout variant; the production net uses the dense
    kernel. See NOTES_ROUND2.md.

    ``s2d_conv_general`` re-places the kernel into an a²-dense S-space conv,
    wasting (k2·a/k)² FLOPs — 16× for the k=3 s=1 full-res convs, which is
    why the fast path used to lose at batch 1. This variant instead builds a
    *phase-extended* grid: each S pixel's a×a phase block is widened with the
    t_pad neighbouring T rows/cols (taken from adjacent S pixels, reflect- or
    zero-padded at the image boundary) to (a+2p)×(a+2p), and the original
    k×k kernel slides over the *phase axes* with the original stride — one
    small conv whose batch is every S pixel. Output T row of S_b phase i at
    S row u is u·a + s·i, reading T rows u·a + (s·i + dy − p): exactly the
    natural conv. Zero wasted FLOPs; read amplification ((a+2p)/a)² on the
    input activations only.

    Requires stride | a, t_pad ≤ a, and the same-size-conv relation
    (a + 2·t_pad − k) // stride + 1 == a // stride (true for every
    FastStyleNet stage). x_s: (B, Hs, Ws, a²·Ci); w: (k, k, Ci, Co).
    """
    k, _, ci, co = w.shape
    p, s = t_pad, stride
    b = a // s
    E = a + 2 * p
    assert a == s * b and p <= a
    assert (E - k) // s + 1 == b, (
        f"phase conv needs (a+2p−k)//s+1 == a//s (k={k}, a={a}, s={s}, p={p})")

    B, Hs, Ws, _ = x_s.shape
    if p > 0:
        if pad_mode == "reflect":
            xp = reflect_pad_s2d(x_s, a, ci, p, (1, 1), (1, 1))
        elif pad_mode == "zero":
            xp = jnp.pad(x_s, ((0, 0), (1, 1), (1, 1), (0, 0)))
        else:
            raise ValueError(pad_mode)
        xr = xp.reshape(B, Hs + 2, Ws + 2, a, a, ci)
        # rows: [phase a−p.. of S row above | own a phases | phase ..p of below]
        xr = jnp.concatenate(
            [xr[:, :Hs, :, a - p:], xr[:, 1:Hs + 1], xr[:, 2:, :, :p]], axis=3)
        xr = jnp.concatenate(
            [xr[:, :, :Ws, :, a - p:], xr[:, :, 1:Ws + 1], xr[:, :, 2:, :, :p]],
            axis=4)
    else:
        xr = x_s.reshape(B, Hs, Ws, a, a, ci)

    y = jax.lax.conv_general_dilated(
        xr.reshape(B * Hs * Ws, E, E, ci), w.astype(x_s.dtype), (s, s),
        "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y.reshape(B, Hs, Ws, b * b * co)


def instance_norm_s2d(x_s: jnp.ndarray, a: int, C: int,
                      scale=None, bias=None, eps: float = 1e-5):
    """Instance norm over T-space (H, W) per T-channel, computed in S_a
    layout: stats reduce over (Hs, Ws) AND the a² phase slots of each
    channel. Optional affine (γ, β) of shape (C,) broadcast over phases."""
    B, Hs, Ws, _ = x_s.shape
    xr = x_s.reshape(B, Hs, Ws, a * a, C)
    mean = xr.mean(axis=(1, 2, 3), keepdims=True)
    var = ((xr - mean) ** 2).mean(axis=(1, 2, 3), keepdims=True)
    out = (xr - mean) / jnp.sqrt(var + eps)
    if scale is not None:
        out = out * scale
    if bias is not None:
        out = out + bias
    return out.reshape(B, Hs, Ws, a * a * C)


def nearest_up2_s2d(x_s: jnp.ndarray, a: int, C: int) -> jnp.ndarray:
    """Nearest 2× upsample expressed purely in phase space: the S_{2a} layout
    of the upsampled image (same grid resolution!) duplicates each phase of
    the S_a input 2×2. T_up(2a·u + py', ...) = T(a·u + py'//2, ...)."""
    B, Hs, Ws, _ = x_s.shape
    xr = x_s.reshape(B, Hs, Ws, a, a, C)
    up = jnp.repeat(jnp.repeat(xr, 2, axis=3), 2, axis=4)
    return up.reshape(B, Hs, Ws, 4 * a * a * C)


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
