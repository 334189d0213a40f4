"""Pallas fused 9×9 stride-1 convolution (the FastStyleNet stem/head).

The XLA path for these convs needs three HBM round-trips (space-to-depth
transpose → quarter-res conv → depth-to-space transpose, ~3.5 ms combined at
436×1024; see vst.kernels.s2d_conv). This kernel fuses all three: the raw
padded input is DMA'd phase-strided into VMEM (the s2d view is a free
reshape of HBM), the im2col patch matrix is built in VMEM, one MXU matmul
(K=(k2²·f²·Ci), N=f²·Co) produces all f² output phases, and the result is
DMA'd phase-strided into the FINAL (H, W, Co) layout — one read of x, one
write of y, no intermediate layout passes.

Weight layout matches vst.kernels.s2d_conv._s2d_weights (matmul form), so
this is a drop-in exact replacement validated against lax.conv.

STATUS: exact in interpret mode; Mosaic compilation currently rejects the
phase-strided DMA ("slice shape along dim 5 must be aligned to tiling
(128), but is 3") — the Ci=3 minor dim is untileable. The fix (round 2) is
a planar (Ci, H, W·pad128) input layout with lane-shift im2col, or the
layout-propagated network (keep ALL stem/head activations s2d-resident so
no d2s/s2d passes exist at all — nearest-upsample becomes free channel
broadcast). The production path meanwhile is vst.kernels.s2d_conv (pure
XLA, 2× over lax.conv).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vst.kernels.s2d_conv import _s2d_weights

F = 4          # space-to-depth factor
TILE_U = 8     # s2d rows per program     → 32 output rows
TILE_V = 128   # s2d cols per program     → 512 output cols


def _kernel(x_ref, w_ref, o_ref, s2d_scratch, out_scratch, sems, k2, ci, co):
    """x_ref: (1, Hq, F, Wq, F, Ci) HBM view of padded input;
    w_ref: (k2²·F²·Ci, F²·Co) VMEM; o_ref: (1, Hu, F, Wv, F, Co) HBM view of
    the output. One program computes a (TILE_U·F, TILE_V·F, Co) output tile."""
    u0 = pl.program_id(0) * TILE_U
    v0 = pl.program_id(1) * TILE_V

    # 1. phase-strided DMA: gather the (TILE_U+k2−1, TILE_V+k2−1, F²·Ci) s2d
    #    halo block from HBM (F² strided copies, one per phase, overlapped)
    hu = TILE_U + k2 - 1
    wv = TILE_V + k2 - 1

    def in_dma(a, b):
        slot = (a * F + b) * ci
        return pltpu.make_async_copy(
            x_ref.at[0, pl.ds(u0, hu), a, pl.ds(v0, wv), b, :],
            s2d_scratch.at[:, :, pl.ds(slot, ci)],
            sems.at[a * F + b],
        )

    for a in range(F):
        for b in range(F):
            in_dma(a, b).start()
    for a in range(F):
        for b in range(F):
            in_dma(a, b).wait()

    # 2. im2col in VMEM: (TILE_U·TILE_V, k2²·F²·Ci), channel-major per tap
    taps = []
    for ky in range(k2):
        for kx in range(k2):
            taps.append(s2d_scratch[ky:ky + TILE_U, kx:kx + TILE_V, :])
    patches = jnp.concatenate(taps, axis=-1).reshape(
        TILE_U * TILE_V, k2 * k2 * F * F * ci
    )

    # 3. one MXU matmul for all phases
    res = jnp.dot(patches, w_ref[:, :], preferred_element_type=jnp.float32)
    out_scratch[:, :, :] = res.reshape(TILE_U, TILE_V, F * F * co)

    # 4. phase-strided DMA into the final (H, W, Co) layout
    def out_dma(py, px):
        slot = (py * F + px) * co
        return pltpu.make_async_copy(
            out_scratch.at[:, :, pl.ds(slot, co)],
            o_ref.at[0, pl.ds(u0, TILE_U), py, pl.ds(v0, TILE_V), px, :],
            sems.at[py * F + px],
        )

    for py in range(F):
        for px in range(F):
            out_dma(py, px).start()
    for py in range(F):
        for px in range(F):
            out_dma(py, px).wait()


def pallas_conv9x9(x: jnp.ndarray, w: jnp.ndarray,
                   interpret: bool = False) -> jnp.ndarray:
    """VALID stride-1 conv of pre-padded x (1, Hp, Wp, Ci) with w
    (k, k, Ci, Co), k odd ≥ 5. Exact vs lax.conv (f32 reassociation only)."""
    B, Hp, Wp, Ci = x.shape
    k, _, _, Co = w.shape
    assert B == 1, "kernel is written for B=1 (vmap for batches)"
    Ho, Wo = Hp - k + 1, Wp - k + 1
    k2 = (F - 1 + k - 1) // F + 1

    # pad H/W so the s2d grid covers all tiles: input side needs
    # gridU·TILE_U + k2 − 1 rows of s2d space, each F raw rows
    grid_u = -(-Ho // (TILE_U * F))
    grid_v = -(-Wo // (TILE_V * F))
    needH = (grid_u * TILE_U + k2 - 1) * F
    needW = (grid_v * TILE_V + k2 - 1) * F
    xp = jnp.pad(x, ((0, 0), (0, needH - Hp), (0, needW - Wp), (0, 0)))
    x6 = xp.reshape(1, needH // F, F, needW // F, F, Ci)

    w2 = _s2d_weights(w, F).reshape(k2 * k2 * F * F * Ci, F * F * Co)

    outH = grid_u * TILE_U * F
    outW = grid_v * TILE_V * F
    out6_shape = (1, outH // F, F, outW // F, F, Co)

    kern = functools.partial(_kernel, k2=k2, ci=Ci, co=Co)
    out6 = pl.pallas_call(
        kern,
        grid=(grid_u, grid_v),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct(out6_shape, x.dtype),
        scratch_shapes=[
            pltpu.VMEM((TILE_U + k2 - 1, TILE_V + k2 - 1, F * F * Ci),
                       x.dtype),
            pltpu.VMEM((TILE_U, TILE_V, F * F * Co), jnp.float32),
            pltpu.SemaphoreType.DMA((F * F,)),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(x6, w2)

    # (1, Hu, F, Wv, F, Co) row-major IS the (1, Hu·F, Wv·F, Co) image —
    # a pure metadata reshape, no transpose
    y = out6.reshape(1, outH, outW, Co)
    return y[:, :Ho, :Wo, :]
