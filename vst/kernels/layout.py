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
