"""Pallas fused reflect-pad + conv kernels (NHWC, natural layout).

Round-2 measurement (NOTES_ROUND2.md, commit a7d0311): the s2d res-chain
rewrite is 1.74× faster than XLA's natural-layout convs *if padding is
free*, but the phase-permuted reflect-pad gathers in XLA erase the entire
gain — XLA materializes the pad concats in HBM. Inside a Pallas kernel the
pad rows arrive as 1-row "sidecar" blocks of the same array, the pad
columns are built as a register value, and the k×k conv is k² tap matmuls
with exact FLOPs; for the FastStyleNet residual trunk (C = C_out = 128)
each tap is a (R·W, 128)×(128, 128) matmul that tiles the MXU exactly.

Structure (v3): the round-2/3 manual double-buffer DMA protocol
(cross-grid-step ``make_async_copy`` handoff with semaphore parity) both
crashed the v5e server toolchain (``tpu_compile_helper exit 1``,
artifacts/pallas_probe.json) and ran 17× slower than XLA where it did
compile. v3 uses only vanilla machinery: blocked input specs that Pallas
auto-pipelines (its pipeline already double-buffers HBM→VMEM fetches),
with the row halo supplied by two extra 1-row blocked views of the SAME
input whose ``index_map``s compute the reflected/clamped source row, and
— when H % row_tile ≠ 0 — one vectorized ``where`` that patches the
boundary-pad row where it falls inside the final (grid-padded, hence
garbage-backed) block.

Mosaic constraints that shaped v3 (scripts/bisect_bf16_pallas.py +
artifacts/pallas_probe.json):
* No cross-grid-step DMA handoff; no manual semaphores.
* Build the column pad as a VALUE (concatenate) — in-place scratch stores
  at odd sublane offsets don't lower.
* Tap slices must be static (dynamic_slice on values is not lowered).
* Block specs may never tile the lane (channel) axis into sub-128 slabs.

Reference: the torch forward pads with ``nn.ReflectionPad2d`` before every
conv (methods/learning-based/network.py:147-170); parity is bitwise-exact
tap placement with f32 accumulation (rel err 0.0 vs the XLA path at f32).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _halo_specs(B, H, W, C, R, reflect, batch_first):
    """Input specs for (x, top, bot): the main (1, R, W, C) row-tile block
    plus two 1-row sidecar views of the same array whose index maps
    resolve the halo rows — reflect (torch ReflectionPad2d: row −1 → 1,
    row H → H−2) or edge clamp. ``batch_first`` picks the grid layout
    (bi, t) vs (t, p)."""
    top_pad = 1 if reflect else 0
    bot_pad = max(H - 2, 0) if reflect else H - 1

    if batch_first:
        def xmap(bi, t):
            return (bi, t, 0, 0)

        def topmap(bi, t):
            return (bi, jnp.where(t == 0, top_pad, t * R - 1), 0, 0)

        def botmap(bi, t):
            return (bi, jnp.where(t * R + R >= H, bot_pad, t * R + R), 0, 0)
    else:
        def xmap(t, p):
            return (0, t, 0, 0)

        def topmap(t, p):
            return (0, jnp.where(t == 0, top_pad, t * R - 1), 0, 0)

        def botmap(t, p):
            return (0, jnp.where(t * R + R >= H, bot_pad, t * R + R), 0, 0)

    return [
        pl.BlockSpec((1, R, W, C), xmap, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, W, C), topmap, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, W, C), botmap, memory_space=pltpu.VMEM),
    ]


def _assemble_window(x_ref, top_ref, bot_ref, t, H, R):
    """(R+2, W, C) halo window = top ⊕ block ⊕ bot, with the boundary pad
    row patched in place when it falls INSIDE the final grid-padded block
    (H % R ≠ 0: the block row at global index H is garbage — Pallas pads
    partial boundary fetches — but tap dy=2 of the last valid output row
    reads it; its correct value is exactly the bot sidecar)."""
    xv = jnp.concatenate([top_ref[0], x_ref[0], bot_ref[0]], axis=0)
    if H % R:
        gids = t * R - 1 + jax.lax.broadcasted_iota(
            jnp.int32, (R + 2, 1, 1), 0)
        xv = jnp.where(gids == H, bot_ref[0], xv)
    return xv


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def conv3x3_reflect(x, w, b, row_tile: int = 16, interpret: bool = False):
    """y = conv3x3(reflect_pad1(x)) + b for x (B, H, W, C) NHWC.

    Thin wrapper over :func:`conv3x3_block_pallas` (the per-channel stats
    it also produces are a negligible VPU epilogue next to the tap
    matmuls); kept as its own custom_vjp entry point for callers that
    want the plain conv without the res-block machinery."""
    y, _ = conv3x3_block_pallas(x, w, b, row_tile=row_tile,
                                interpret=interpret)
    return y


def res_chain_wants_pallas(x, w):
    """The fused kernel beats XLA for the b1 inference trunk shape:
    single image, C = C_out, lane-aligned W, enough rows to tile. Training
    batches keep the XLA path (the kernel is written for B = 1; batched
    convs amortize pad gathers over the batch anyway).
    OPT-IN (VST_PALLAS_CONV=1): in ISOLATION the fused kernel beats the
    XLA conv by ~20% (0.19-0.21 vs 0.24-0.26 ms at the Johnson trunk
    shape, scripts/bench_pallas_conv.py), but dropped into the full net it
    LOSES ~1 ms (scripts/ab_b1.py): each pallas_call is a fusion barrier,
    so the IN/relu/residual elementwise work between convs stops fusing
    into the conv programs and pays extra HBM round trips. Until the
    res-block epilogue is fused INTO the kernel, the net keeps XLA."""
    import os

    if os.environ.get("VST_PALLAS_CONV") != "1":
        return False
    _, H, W, C = x.shape
    return (x.shape[0] == 1 and w.shape[2] == C and w.shape[3] == C
            and C % 128 == 0 and W % 128 == 0 and H >= 48)


def _conv3x3_reflect_fwd(x, w, b, row_tile, interpret):
    return conv3x3_reflect(x, w, b, row_tile, interpret), (x, w, b)


def _conv3x3_reflect_bwd(row_tile, interpret, res, g):
    # backward through the mathematically identical XLA path — the kernel
    # is forward-fused for b1 inference; training graphs are batched and
    # never hit it, but grads must still be correct if one does
    x, w, b = res
    _, vjp = jax.vjp(conv3x3_reflect_ref, x, w, b)
    return vjp(g)


conv3x3_reflect.defvjp(_conv3x3_reflect_fwd, _conv3x3_reflect_bwd)


def conv3x3_reflect_ref(x, w, b):
    """XLA reference implementation (what the model previously ran)."""
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
    return jax.lax.conv_general_dilated(
        xp, w.astype(x.dtype), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + b.astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def up2_conv_subpixel_pallas(x, w, b, row_tile: int = 8,
                             interpret: bool = False):
    """Fused FastStyleNet decoder stage: nearest-up2 ∘ reflect-pad(1) ∘
    conv3×3 computed at the COARSE resolution via the folded per-phase
    kernel (vst.kernels.layout.fold_up2_kernel, exact math) with the
    edge-pad built in VMEM and the depth-to-space applied in-register
    before the output write. Replaces up2_conv_subpixel whose separate XLA
    d2s pass costs 0.8 ms in HBM at the dec2 shape (scripts/bisect_stages).

    x: (1, h, w, Ci); w: (3, 3, Ci, Co) torch-layout; b: (Co,).
    Returns (1, 2h, 2w, Co). Reference stage: network.py:173-191.

    Mosaic-safe structure: the row phase py is a second GRID axis rather
    than an in-register depth-to-space (v1's
    reshape(R,w,2,2,Co).transpose(0,2,1,3,4) was rejected by the v5e
    toolchain — the permute splits the lane dim). Instance (t, py)
    convolves its row tile against the py-half of the folded kernel
    (selected by the weight BlockSpec index_map — no register slicing)
    and stores rows of parity py; the (w, px, Co) → (2w, Co) column
    interleave and the row interleave are contiguous reinterpretations
    done by ONE free XLA reshape outside the kernel. Row tiles and their
    edge-clamped halo rows arrive as auto-pipelined blocked views
    (_halo_specs); x's block index is p-invariant so the pipeline fetches
    each tile once for both phases.
    """
    from vst.kernels.layout import fold_up2_kernel

    if jax.default_backend() == "cpu":
        interpret = True
    _, h, wd, Ci = x.shape
    Co = w.shape[-1]
    wf = fold_up2_kernel(w)  # (3, 3, Ci, 4·Co), phase order (py·2+px)·Co+c
    # split by py → (2, 3, 3, Ci, 2·Co), each half's channels (px, Co)
    wf = wf.reshape(3, 3, Ci, 2, 2 * Co).transpose(3, 0, 1, 2, 4)
    b2 = jnp.tile(b, 2)  # (2·Co,), order (px, Co)
    # same v5e R·W ≤ 2048 clamp as conv3x3_block_pallas (R8·W512 crashed
    # the remote compile helper; R4·W512 is the dec2 configuration)
    R = max(1, min(row_tile, 2048 // wd if wd <= 2048 else 1))
    n_tiles = pl.cdiv(h, R)

    def kernel(x_ref, top_ref, bot_ref, w_ref, b_ref, y_ref):
        t = pl.program_id(0)
        xv = _assemble_window(x_ref, top_ref, bot_ref, t, h, R)
        # edge column pad: duplicate first/last columns
        xp = jnp.concatenate([xv[:, 0:1], xv, xv[:, wd - 1:wd]], axis=1)

        acc = jnp.zeros((R * wd, 2 * Co), jnp.float32)
        for dy in range(3):
            for dx in range(3):
                tap = xp[dy:dy + R, dx:dx + wd]
                acc = acc + jax.lax.dot_general(
                    tap.reshape(R * wd, Ci), w_ref[0, dy, dx],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
        acc = acc + b_ref[...].astype(jnp.float32)
        y_ref[...] = acc.reshape(1, R, 1, wd, 2 * Co).astype(y_ref.dtype)

    y = pl.pallas_call(
        kernel,
        grid=(n_tiles, 2),
        in_specs=_halo_specs(1, h, wd, Ci, R, reflect=False,
                             batch_first=False) + [
            pl.BlockSpec((1, 3, 3, Ci, 2 * Co),
                         lambda t, p: (p, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, R, 1, wd, 2 * Co), lambda t, p: (0, t, p, 0, 0),
            memory_space=pltpu.VMEM),
        # exact shape (boundary blocks masked) so the reshape below is free
        out_shape=jax.ShapeDtypeStruct((1, h, 2, wd, 2 * Co), x.dtype),
        interpret=interpret,
    )(x, x, x, wf.astype(x.dtype), b2.astype(x.dtype))
    # (h, py, w, px, Co) contiguous ≡ (2h, 2w, Co): free reinterpretation
    return y.reshape(1, 2 * h, 2 * wd, Co)


def _up2_subpixel_ref(x, w, b):
    from vst.kernels.layout import up2_conv_subpixel

    return up2_conv_subpixel(x, w) + b.astype(x.dtype)


def _up2_fwd(x, w, b, row_tile, interpret):
    return up2_conv_subpixel_pallas(x, w, b, row_tile, interpret), (x, w, b)


def _up2_bwd(row_tile, interpret, res, g):
    x, w, b = res
    _, vjp = jax.vjp(_up2_subpixel_ref, x, w, b)
    return vjp(g)


up2_conv_subpixel_pallas.defvjp(_up2_fwd, _up2_bwd)


def up2_wants_pallas(x, co):
    """Gate for the fused decoder stage (same opt-in as
    res_chain_wants_pallas until the in-net win is measured)."""
    import os

    if os.environ.get("VST_PALLAS_CONV") != "1":
        return False
    _, h, wd, ci = x.shape
    return (x.shape[0] == 1 and wd % 128 == 0 and h >= 24
            and ci % 32 == 0 and co % 32 == 0)


def conv3x3_block_pallas(x, w, b, pre_norm=None, row_tile: int = 16,
                         interpret: bool = False):
    """Res-block building kernel: optional inline pre-normalization
    (instance-norm affine + relu applied to the INPUT on the fly), fused
    reflect-pad conv3×3, and per-(sample, channel) (sum, sumsq) of the
    OUTPUT accumulated across row tiles.

    With two calls this computes a full FastStyleNet residual block
    (network.py:219-261) with zero standalone elementwise passes:
      t1, s1 = conv3x3_block_pallas(h, w1, b1)
      y2, s2 = conv3x3_block_pallas(t1, w2, b2, pre_norm=(μ1,σ1,γ1,β1))
      h'     = strength·(norm2(y2)·γ2 + β2) + h   # one fused XLA op
    where (μ, σ⁻¹) derive from the returned sums. XLA's version pays a
    stats pass + a normalize+relu pass + a pad materialization per conv —
    all HBM round trips this kernel absorbs into VMEM.

    x: (B, H, W, C); w: (3, 3, C, C_out); pre_norm: (mean, inv_std,
    gamma, beta) — mean/inv_std (B, C) per-sample, gamma/beta (C,) —
    applied as relu((x−μ)·inv·γ+β) before padding. Returns
    (y (B, H, W, C_out), stats (B, 2, C_out) f32 [sum, sumsq] over the
    H·W valid pixels of y). Batches map to the outer grid axis (one
    sample's row tile per instance; instance-norm stats never cross
    samples). Row tiles + reflect halo rows arrive as auto-pipelined
    blocked views (_halo_specs) — Pallas's pipeline double-buffers the
    HBM→VMEM fetches, which the retired manual DMA protocol did by hand.
    """
    if jax.default_backend() == "cpu":
        interpret = True
    B, H, W, C = x.shape
    C_out = w.shape[-1]
    # v5e server-Mosaic verdict (artifacts/pallas_probe.json): kernels
    # whose flattened tap matmul has R·W ≥ 4096 rows crash the remote
    # compile helper (R16·W256 and R8·W512 fail; R8·W256 compiles) —
    # clamp the row tile so R·W ≤ 2048
    R = max(1, min(row_tile, 2048 // W if W <= 2048 else 1))
    n_tiles = pl.cdiv(H, R)
    n_norm = 4 if pre_norm is not None else 0

    def kernel(*refs):
        x_ref, top_ref, bot_ref, w_ref, b_ref = refs[:5]
        norm_refs = refs[5:5 + n_norm]
        y_ref, st_ref = refs[5 + n_norm], refs[6 + n_norm]
        t = pl.program_id(1)

        @pl.when(t == 0)
        def _():
            st_ref[...] = jnp.zeros((1, 2, C_out), jnp.float32)

        xv = _assemble_window(x_ref, top_ref, bot_ref, t, H, R)
        if n_norm:
            mu, inv = norm_refs[0][0], norm_refs[1][0]  # sample slabs
            gam, bet = norm_refs[2][...], norm_refs[3][...]
            xv = jax.nn.relu(
                ((xv.astype(jnp.float32) - mu) * (inv * gam) + bet)
            ).astype(xv.dtype)
        xp = jnp.concatenate([xv[:, 1:2], xv, xv[:, W - 2:W - 1]], axis=1)

        acc = jnp.zeros((R * W, C_out), jnp.float32)
        for dy in range(3):
            for dx in range(3):
                tap = xp[dy:dy + R, dx:dx + W]
                acc = acc + jax.lax.dot_general(
                    tap.reshape(R * W, C), w_ref[dy, dx],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
        acc = acc + b_ref[...].astype(jnp.float32)
        y_ref[...] = acc.reshape(1, R, W, C_out).astype(y_ref.dtype)

        # per-channel stats over VALID rows (grid padding excluded)
        valid = (t * R + jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0)) < H
        am = jnp.where(
            jnp.broadcast_to(valid[:, :, None], (R, W, C_out)).reshape(
                R * W, C_out),
            acc, 0.0)
        st_ref[0, 0:1] += jnp.sum(am, axis=0, keepdims=True)
        st_ref[0, 1:2] += jnp.sum(am * am, axis=0, keepdims=True)

    in_specs = _halo_specs(B, H, W, C, R, reflect=True, batch_first=True) + [
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
    ]
    args = [x, x, x, w.astype(x.dtype), b.astype(x.dtype)]
    if pre_norm is not None:
        mu, inv, gam, bet = pre_norm
        # per-sample stats blocked by the batch grid axis; carried as
        # (B, 1, C) so the block's last two dims (1, C) equal the array's
        # (a (1, C) block of a (B, C) array is illegal for B > 1: bs1=1
        # vs as1=B fails the (8, 128)-divisibility rule)
        in_specs.append(pl.BlockSpec((1, 1, C), lambda bi, t: (bi, 0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(mu.reshape(B, 1, C).astype(jnp.float32))
        in_specs.append(pl.BlockSpec((1, 1, C), lambda bi, t: (bi, 0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(inv.reshape(B, 1, C).astype(jnp.float32))
        for v in (gam, bet):
            in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
            args.append(v.astype(jnp.float32))
    y, st = pl.pallas_call(
        kernel,
        grid=(B, n_tiles),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, R, W, C_out), lambda bi, t: (bi, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, C_out), lambda bi, t: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, W, C_out), x.dtype),
            jax.ShapeDtypeStruct((B, 2, C_out), jnp.float32),
        ],
        interpret=interpret,
    )(*args)
    return y, st


def res_block_pallas(h, w1, b1, g1, be1, w2, b2, g2, be2, strength,
                     eps: float = 1e-5, row_tile: int = 16):
    """Full FastStyleNet residual block via two fused kernels + one XLA
    elementwise epilogue. Numerics: conv accumulation f32, IN stats f32
    via sum/sumsq (algebraically = the two-pass biased variance).
    Works for any batch (stats are per-sample, matching instance norm)."""
    n = h.shape[1] * h.shape[2]
    t1, s1 = conv3x3_block_pallas(h, w1, b1, row_tile=row_tile)
    mu1 = s1[:, 0] / n  # (B, C)
    var1 = jnp.maximum(s1[:, 1] / n - mu1 * mu1, 0.0)
    inv1 = jax.lax.rsqrt(var1 + eps)
    y2, s2 = conv3x3_block_pallas(
        t1, w2, b2, pre_norm=(mu1, inv1, g1, be1), row_tile=row_tile)
    mu2 = (s2[:, 0] / n)[:, None, None, :]  # (B, 1, 1, C)
    var2 = jnp.maximum(s2[:, 1] / n - (s2[:, 0] / n) ** 2, 0.0)
    inv2 = jax.lax.rsqrt(var2 + eps)[:, None, None, :]
    y2f = y2.astype(jnp.float32)
    out = strength * ((y2f - mu2) * (inv2 * g2) + be2) + h.astype(jnp.float32)
    return out.astype(h.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4))
def pallas_d2s(x_s, f: int, C: int, row_tile: int = 4,
               interpret: bool = False):
    """Depth-to-space S_f(1, Hs, Ws, f²·C) → T(1, f·Hs, f·Ws, C) as a
    Pallas relayout. XLA lowers the same reshape∘transpose∘reshape as an
    HBM gather costing ~0.8 ms at the stem1/head shapes
    (scripts/bisect_stages.py); the HBM floor is read+write only.

    Mosaic-safe formulation (v1 was rejected on real v5e:
    "infer-vector-layout: unsupported shape cast" — the register
    transpose split the lane dim): block the row-phase py over a second
    GRID axis. Instance (t, p) copies the channel slab
    x_s[..., p·fC:(p+1)·fC] — whose inner order is (px, C), phase order
    (py·f+px)·C+c — into output rows of parity p. Within a row the
    (Ws, px, C) → (f·Ws, C) interleave and across rows the
    (Hs, py, …) → (f·Hs, …) interleave are CONTIGUOUS reinterpretations,
    done by free XLA reshapes outside the kernel; no register op ever
    crosses the lane boundary (the kernel body is a unit-dim reshape)."""
    if jax.default_backend() == "cpu":
        interpret = True
    _, Hs, Ws, Cf = x_s.shape
    assert Cf == f * f * C
    fC = f * C
    R = row_tile
    n_tiles = pl.cdiv(Hs, R)

    def kernel(x_ref, y_ref):
        y_ref[...] = x_ref[...].reshape(1, R, 1, Ws, fC)

    y = pl.pallas_call(
        kernel,
        grid=(n_tiles, f),
        in_specs=[pl.BlockSpec((1, R, Ws, fC), lambda t, p: (0, t, 0, p),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, R, 1, Ws, fC),
                               lambda t, p: (0, t, p, 0, 0),
                               memory_space=pltpu.VMEM),
        # exact (non-grid-padded) shape: Pallas masks boundary blocks, and
        # the final reinterpretation below stays a FREE reshape (a crop
        # would turn it into a copy)
        out_shape=jax.ShapeDtypeStruct((1, Hs, f, Ws, fC), x_s.dtype),
        interpret=interpret,
    )(x_s)
    # (Hs, py, Ws, px, C) → (f·Hs, f·Ws, C): contiguous → free reshape
    return y.reshape(1, f * Hs, f * Ws, C)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def pallas_s2d(x, f: int, row_tile: int = 4, interpret: bool = False):
    """Space-to-depth T(1, H, W, C) → S_f(1, H/f, W/f, f²·C), the inverse
    relayout of pallas_d2s (same grid-phase structure, directions
    swapped: the input is pre-viewed as (Hs, py, Ws, px·C) for free and
    instance (t, p) writes channel slab p)."""
    if jax.default_backend() == "cpu":
        interpret = True
    _, H, W, C = x.shape
    assert H % f == 0 and W % f == 0
    Hs, Ws = H // f, W // f
    fC = f * C
    R = row_tile
    n_tiles = pl.cdiv(Hs, R)
    xv = x.reshape(1, Hs, f, Ws, fC)  # contiguous view, free

    def kernel(x_ref, y_ref):
        y_ref[...] = x_ref[...].reshape(1, R, Ws, fC)

    y = pl.pallas_call(
        kernel,
        grid=(n_tiles, f),
        in_specs=[pl.BlockSpec((1, R, 1, Ws, fC),
                               lambda t, p: (0, t, p, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, R, Ws, fC), lambda t, p: (0, t, 0, p),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, Hs, Ws, f * f * C), x.dtype),
        interpret=interpret,
    )(xv)
    return y


# the two relayouts are exact adjoints of each other
def _d2s_fwd(x_s, f, C, row_tile, interpret):
    return pallas_d2s(x_s, f, C, row_tile, interpret), None


def _d2s_bwd(f, C, row_tile, interpret, _, g):
    return (pallas_s2d(g, f, row_tile, interpret),)


pallas_d2s.defvjp(_d2s_fwd, _d2s_bwd)


def _s2d_fwd(x, f, row_tile, interpret):
    return pallas_s2d(x, f, row_tile, interpret), x.shape[-1]


def _s2d_bwd(f, row_tile, interpret, C, g):
    return (pallas_d2s(g, f, C, row_tile, interpret),)


pallas_s2d.defvjp(_s2d_fwd, _s2d_bwd)
