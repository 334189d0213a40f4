"""Pallas fused reflect-pad + conv kernels (NHWC, natural layout).

Round-2 measurement (NOTES_ROUND2.md, commit a7d0311): the s2d res-chain
rewrite is 1.74× faster than XLA's natural-layout convs *if padding is
free*, but the phase-permuted reflect-pad gathers in XLA erase the entire
gain — XLA materializes the pad concats in HBM. Inside a Pallas kernel the
pad rows arrive by reflect-indexed row DMA, the pad columns are built as a
register value, and the k×k conv is k² tap matmuls with exact FLOPs; for
the FastStyleNet residual trunk (C = C_out = 128) each tap is a
(R·W, 128)×(128, 128) matmul that tiles the MXU exactly.

Mosaic constraints discovered on v5e (scripts/bisect_bf16_pallas.py):
* DMA targets must be sublane-aligned — copy full (1, W, C) rows into an
  UNPADDED (R+2, W, C) scratch (offset-1 column slices of a padded scratch
  fail to compile for bf16).
* Build the column pad as a VALUE (concatenate) — in-place scratch stores
  at odd sublane offsets don't lower.
* Tap slices must be static (dynamic_slice on values is not lowered).

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


def _reflect_row_index(r, H):
    # torch ReflectionPad2d: row −1 → 1, row H → H−2
    return jnp.where(r < 0, -r, jnp.where(r >= H, 2 * H - 2 - r, r))


def _halo_row_groups(x_hbm, xbuf, sem, sample, H, R, n_tiles, reflect):
    """Shared double-buffer DMA group builders for a halo'd (R+2)-row tile
    stream. Returns (first, interior, tail): each returns the copy list
    for tile 0 / interior tile ``tau`` / the last tile, targeting buffer
    ``k``. ``reflect`` selects the boundary-pad row sources (torch
    ReflectionPad2d) vs edge clamp. The SAME builders are used on the
    issue and wait sides so semaphore counts always match."""
    last = n_tiles - 1
    body_last = max(0, H - (last * R - 1))

    def pad_src(row):  # static python int: boundary row for logical `row`
        if reflect:
            return min(max(2 * H - 2 - row, 0), H - 1)
        return H - 1

    top_src = 1 if reflect else 0

    def first(k):
        sm = sem.at[k]
        if n_tiles == 1:
            cps = [pltpu.make_async_copy(
                x_hbm.at[sample, pl.ds(0, H)], xbuf.at[k, pl.ds(1, H)], sm),
                pltpu.make_async_copy(
                    x_hbm.at[sample, pl.ds(top_src, 1)],
                    xbuf.at[k, pl.ds(0, 1)], sm)]
            for i in range(H + 1, R + 2):
                cps.append(pltpu.make_async_copy(
                    x_hbm.at[sample, pl.ds(pad_src(i - 1), 1)],
                    xbuf.at[k, pl.ds(i, 1)], sm))
            return cps
        return [
            pltpu.make_async_copy(x_hbm.at[sample, pl.ds(0, R + 1)],
                                  xbuf.at[k, pl.ds(1, R + 1)], sm),
            pltpu.make_async_copy(x_hbm.at[sample, pl.ds(top_src, 1)],
                                  xbuf.at[k, pl.ds(0, 1)], sm),
        ]

    def interior(tau, k):
        return [pltpu.make_async_copy(
            x_hbm.at[sample, pl.ds(tau * R - 1, R + 2)], xbuf.at[k],
            sem.at[k])]

    def tail(k):
        sm = sem.at[k]
        cps = [pltpu.make_async_copy(
            x_hbm.at[sample, pl.ds(last * R - 1, body_last)],
            xbuf.at[k, pl.ds(0, body_last)], sm)]
        for i in range(body_last, R + 2):
            cps.append(pltpu.make_async_copy(
                x_hbm.at[sample, pl.ds(pad_src(last * R - 1 + i), 1)],
                xbuf.at[k, pl.ds(i, 1)], sm))
        return cps

    return first, interior, tail


def _db_issue(t, gate, n_tiles, groups):
    """Issue side of the double-buffer handoff: tile 0 synchronously at
    the first gated step, tile t+1 into buffer (t+1)%2 otherwise. ``gate``
    marks the one step per tile that owns DMA (True, or p == 0 when a
    phase axis revisits the same rows)."""
    first, interior, tail = groups
    last = n_tiles - 1

    @pl.when(jnp.logical_and(t == 0, gate))
    def _():
        for cp in first(0):
            cp.start()

    if n_tiles > 1:
        for k in (0, 1):
            nxt = jnp.logical_and(gate, jnp.equal(jax.lax.rem(t + 1, 2), k))

            @pl.when(jnp.logical_and(
                nxt, jnp.logical_and(t + 1 > 0, t + 1 < last)))
            def _(k=k):
                for cp in interior(t + 1, k):
                    cp.start()

            @pl.when(jnp.logical_and(nxt, t + 1 == last))
            def _(k=k):
                for cp in tail(k):
                    cp.start()


def _db_wait_compute(t, gate, n_tiles, groups, xbuf, compute):
    """Wait side: await tile t's buffer (parity-static branches — Mosaic
    needs static scratch indices for register loads), then run ``compute``
    on the resident rows at EVERY step (waits only at gated steps)."""
    first, interior, tail = groups
    last = n_tiles - 1
    for k in (0, 1):
        par = jnp.equal(jax.lax.rem(t, 2), k)
        at = jnp.logical_and(par, gate)

        @pl.when(jnp.logical_and(at, t == 0))
        def _(k=k):
            for cp in first(k):
                cp.wait()

        if n_tiles > 1:
            @pl.when(jnp.logical_and(at, jnp.logical_and(t > 0, t < last)))
            def _(k=k):
                for cp in interior(t, k):
                    cp.wait()

            @pl.when(jnp.logical_and(at, t == last))
            def _(k=k):
                for cp in tail(k):
                    cp.wait()

        @pl.when(par)
        def _(k=k):
            compute(xbuf[k])


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
    done by ONE free XLA reshape outside the kernel.
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
    R = row_tile
    n_tiles = pl.cdiv(h, R)

    def kernel(x_hbm, w_ref, b_ref, y_ref, xbuf, sem):
        t = pl.program_id(0)
        p = pl.program_id(1)

        # edge row pad = clamped contiguous spans; one DMA group PER TILE
        # (issued/awaited at the p == 0 phase step — the p == 1 step of the
        # same tile reuses the resident buffer), double-buffered so tile
        # t+1's rows stream in while tile t's two phases compute
        groups = _halo_row_groups(x_hbm, xbuf, sem, 0, h, R, n_tiles,
                                  reflect=False)
        _db_issue(t, p == 0, n_tiles, groups)

        def compute(xv):
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

        _db_wait_compute(t, p == 0, n_tiles, groups, xbuf, compute)

    y = pl.pallas_call(
        kernel,
        grid=(n_tiles, 2),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
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
        scratch_shapes=[
            pltpu.VMEM((2, R + 2, wd, Ci), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        # cross-step DMA handoff requires strictly sequential grid steps
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(x, wf.astype(x.dtype), b2.astype(x.dtype))
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
    H·W valid pixels of y). Batches map to a second grid axis (one
    sample's row tile per instance; instance-norm stats never cross
    samples).
    """
    if jax.default_backend() == "cpu":
        interpret = True
    B, H, W, C = x.shape
    C_out = w.shape[-1]
    R = row_tile
    n_tiles = pl.cdiv(H, R)
    n_norm = 4 if pre_norm is not None else 0

    def kernel(*refs):
        x_hbm, w_ref, b_ref = refs[0], refs[1], refs[2]
        norm_refs = refs[3:3 + n_norm]
        y_ref, st_ref = refs[3 + n_norm], refs[4 + n_norm]
        xbuf, sem = refs[5 + n_norm], refs[6 + n_norm]
        bi = pl.program_id(0)
        t = pl.program_id(1)

        # double-buffered halo'd row DMA: tile τ's rows live in buffer
        # τ%2; tile τ+1's copy is issued BEFORE waiting on tile τ's, so
        # the next tile's HBM traffic overlaps this tile's matmuls (the
        # single-buffer version stalled ~6 µs per 30 µs tile on the
        # synchronous wait)
        groups = _halo_row_groups(x_hbm, xbuf, sem, bi, H, R, n_tiles,
                                  reflect=True)
        _db_issue(t, True, n_tiles, groups)

        def compute(xv):
            r0 = t * R
            if n_norm:
                mu, inv = norm_refs[0][0], norm_refs[1][0]  # sample slabs
                gam, bet = norm_refs[2][...], norm_refs[3][...]
                xv = jax.nn.relu(
                    ((xv.astype(jnp.float32) - mu) * (inv * gam) + bet)
                ).astype(xv.dtype)
            xp = jnp.concatenate([xv[:, 1:2], xv, xv[:, W - 2:W - 1]],
                                 axis=1)

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
            valid = (r0 + jax.lax.broadcasted_iota(
                jnp.int32, (R, 1), 0)) < H
            am = jnp.where(
                jnp.broadcast_to(valid[:, :, None], (R, W, C_out)).reshape(
                    R * W, C_out),
                acc, 0.0)
            st_ref[0, 0:1] += jnp.sum(am, axis=0, keepdims=True)
            st_ref[0, 1:2] += jnp.sum(am * am, axis=0, keepdims=True)

        @pl.when(t == 0)
        def _():
            st_ref[...] = jnp.zeros((1, 2, C_out), jnp.float32)

        _db_wait_compute(t, True, n_tiles, groups, xbuf, compute)

    in_specs = [pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM)]
    args = [x, w.astype(x.dtype), b.astype(x.dtype)]
    if pre_norm is not None:
        mu, inv, gam, bet = pre_norm
        # per-sample (B, C) stats blocked by the batch grid axis
        in_specs.append(pl.BlockSpec((1, C), lambda bi, t: (bi, 0),
                                     memory_space=pltpu.VMEM))
        args.append(mu.reshape(B, C).astype(jnp.float32))
        in_specs.append(pl.BlockSpec((1, C), lambda bi, t: (bi, 0),
                                     memory_space=pltpu.VMEM))
        args.append(inv.reshape(B, C).astype(jnp.float32))
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
        scratch_shapes=[
            pltpu.VMEM((2, R + 2, W, C), x.dtype),  # double-buffered rows
            pltpu.SemaphoreType.DMA((2,)),
        ],
        # cross-step DMA handoff requires strictly sequential grid steps
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
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
