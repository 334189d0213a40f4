"""Pallas correlation-window lookup — the RAFT hot op (SURVEY §2.6's
``alt_cuda_corr`` slot).

XLA lowers the windowed bilinear sample as a generic gather: ~33 ms per
20-level-set lookup at Sintel res (≈0.7 s of each 1.65 s RAFT pass) — about
30× off HBM bandwidth because random-access gather issues one transaction
per element. This kernel instead makes each query's OWN correlation map
VMEM-resident (the volume layout is (Q, h, w): query-major, so a block of
queries is a contiguous DMA) and evaluates all 81 window samples as
mask-weighted row-block reductions on the VPU — no gather at all:

    out[k] = Σ_rows Σ_cols map·row_mask(y_k)·col_mask(x_k)

built from two iota comparisons per sample (the bilinear weights fold into
the masks). Per query that is 81·(rows·w) MACs — pure vector math.

Bit-exactness: matches vst.flow.corr.lookup_pyramid up to f32 reassociation
(tested). Falls back to the XLA path for shapes whose map width isn't a
multiple of 128 lanes.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

QB = 8  # queries per grid step


def _kernel(coords_ref, corr_ref, out_ref, *, h, w, r, lvl_scale):
    """coords_ref: (QB, 2) f32 (x, y) level-0 pixel coords;
    corr_ref: (QB, h, w) f32 — the QB queries' own maps;
    out_ref: (QB, n²) with n = 2r+1.

    All n² samples of one query evaluate as ONE (n², h)·(h, w) MXU matmul
    followed by a masked row reduction — the bilinear weights live in the
    row/column masks (two iota comparisons each)."""
    n = 2 * r + 1
    n2 = n * n

    # per-sample window offsets: X varies along the FIRST window axis
    # (reference corr.py:37-43 quirk)
    k_iota = jax.lax.broadcasted_iota(jnp.int32, (n2, 1), 0).astype(jnp.float32)
    da = jnp.floor(k_iota / n) - r   # (n², 1) X offsets
    db = jnp.mod(k_iota, n) - r      # (n², 1) Y offsets

    col_iota = jax.lax.broadcasted_iota(jnp.int32, (n2, w), 1).astype(jnp.float32)
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (n2, h), 1).astype(jnp.float32)

    rows = []
    for qi in range(QB):
        cx = coords_ref[qi, 0] * lvl_scale
        cy = coords_ref[qi, 1] * lvl_scale
        x = cx + da          # (n², 1)
        y = cy + db
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        wx1 = x - x0
        wy1 = y - y0

        col_w = (
            jnp.where((col_iota == x0) & (x0 >= 0), 1.0 - wx1, 0.0)
            + jnp.where((col_iota == x0 + 1) & (x0 + 1 <= w - 1), wx1, 0.0)
        )  # (n², w); iota==x0 implies x0 <= w−1, x0+1 >= 0
        row_w = (
            jnp.where((row_iota == y0) & (y0 >= 0), 1.0 - wy1, 0.0)
            + jnp.where((row_iota == y0 + 1) & (y0 + 1 <= h - 1), wy1, 0.0)
        )  # (n², h)

        # default MXU precision: the window interpolation multiplies run in
        # bf16 (~0.2% relative error on corr values) — 5× faster than the
        # XLA gather; HIGHEST-precision dots do not currently lower in
        # Mosaic. Opt-in via RAFT(pallas_lookup=True); the exact XLA path
        # stays the default for strict parity.
        tmp = jnp.dot(row_w, corr_ref[qi],
                      preferred_element_type=jnp.float32)  # (n², w)
        rows.append(jnp.sum(col_w * tmp, axis=1))  # (n²,)

    out_ref[:, :] = jnp.stack(rows, axis=0)


def pallas_lookup_level(
    corr: jnp.ndarray, coords: jnp.ndarray, radius: int, lvl: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """One pyramid level: corr (Q, h, w, 1), coords (Q, 2) level-0 pixel
    coords; returns (Q, (2r+1)²)."""
    Q, h, w, _ = corr.shape
    n = 2 * radius + 1
    if jax.default_backend() == "cpu":
        interpret = True  # Mosaic is TPU-only; CPU tests run interpreted
    qpad = (-Q) % QB
    corr2 = corr.reshape(Q, h, w)
    coords2 = coords
    if qpad:
        corr2 = jnp.pad(corr2, ((0, qpad), (0, 0), (0, 0)))
        coords2 = jnp.pad(coords2, ((0, qpad), (0, 0)))

    kern = functools.partial(_kernel, h=h, w=w, r=radius,
                             lvl_scale=1.0 / (2 ** lvl))
    out = pl.pallas_call(
        kern,
        grid=((Q + qpad) // QB,),
        in_specs=[
            pl.BlockSpec((QB, 2), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((QB, h, w), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((QB, n * n), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(((Q + qpad), n * n), corr.dtype),
        interpret=interpret,
    )(coords2, corr2)
    return out[:Q]


def _lookup_forward(pyramid, coords, radius: int, batch: int,
                    interpret: bool = False) -> jnp.ndarray:
    B, H, W, _ = coords.shape
    c2 = coords.reshape(B * H * W, 2)
    outs = [
        pallas_lookup_level(corr, c2, radius, i, interpret=interpret)
        for i, corr in enumerate(pyramid)
    ]
    n = 2 * radius + 1
    out = jnp.concatenate(outs, axis=-1)
    return out.reshape(B, H, W, len(pyramid) * n * n)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def pallas_lookup_pyramid(pyramid, coords, radius: int, batch: int):
    """Drop-in for vst.flow.corr.lookup_pyramid (same channel ordering).

    Differentiable: the backward pass routes through the exact XLA gather
    path's VJP (the Pallas kernel is forward-only) — training graphs that
    backprop through RAFT (MoGAN) keep exact gradients while inference gets
    the 16× kernel."""
    return _lookup_forward(pyramid, coords, radius, batch)


def _lookup_fwd(pyramid, coords, radius, batch):
    return _lookup_forward(pyramid, coords, radius, batch), (pyramid, coords)


def _lookup_bwd(radius, batch, res, g):
    from vst.flow.corr import lookup_pyramid

    pyramid, coords = res
    _, vjp = jax.vjp(lambda p, c: lookup_pyramid(p, c, radius, batch),
                     pyramid, coords)
    return vjp(g)


pallas_lookup_pyramid.defvjp(_lookup_fwd, _lookup_bwd)
