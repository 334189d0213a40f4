"""Trunk conv in Pallas: 9 tap dots (K=128,N=128) vs one im2col dot
(K=1152, N=128) vs 3-row-packed dots (K=384). Also output-stationary
variants. f32 and bf16."""
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

H, W, C = 109, 256, 128
N_CONV = 10


def refl(r):
    return jnp.where(r < 0, -r, jnp.where(r >= H, 2 * H - 2 - r, r))


def make(variant, dtype, R=16):
    n_tiles = pl.cdiv(H, R)
    last = n_tiles - 1
    body_last = H - (last * R - 1)

    def kernel(x_hbm, w_ref, y_ref, xbuf, sem):
        t = pl.program_id(0)
        r0 = t * R

        first = [
            pltpu.make_async_copy(x_hbm.at[0, pl.ds(0, R + 1)],
                                  xbuf.at[pl.ds(1, R + 1)], sem),
            pltpu.make_async_copy(x_hbm.at[0, pl.ds(1, 1)],
                                  xbuf.at[pl.ds(0, 1)], sem),
        ]
        interior = [pltpu.make_async_copy(
            x_hbm.at[0, pl.ds(r0 - 1, R + 2)], xbuf, sem)]
        tail = [pltpu.make_async_copy(
            x_hbm.at[0, pl.ds(last * R - 1, body_last)],
            xbuf.at[pl.ds(0, body_last)], sem)]
        for i in range(body_last, R + 2):
            src = 2 * H - 2 - (last * R - 1 + i)
            tail.append(pltpu.make_async_copy(
                x_hbm.at[0, pl.ds(src, 1)], xbuf.at[pl.ds(i, 1)], sem))
        conds = [(t == 0, first),
                 (jnp.logical_and(t > 0, t < last), interior),
                 (t == last, tail)]
        for cond, cps in conds:
            @pl.when(cond)
            def _():
                for cp in cps:
                    cp.start()
                for cp in cps:
                    cp.wait()

        xv = xbuf[...]
        xp = jnp.concatenate([xv[:, 1:2], xv, xv[:, W - 2:W - 1]], axis=1)

        if variant == "tap9":
            acc = jnp.zeros((R * W, C), jnp.float32)
            for dy in range(3):
                for dx in range(3):
                    tap = xp[dy:dy + R, dx:dx + W]
                    acc = acc + jax.lax.dot_general(
                        tap.reshape(R * W, C), w_ref[dy, dx],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
        elif variant == "im2col":
            cols = []
            for dy in range(3):
                for dx in range(3):
                    cols.append(xp[dy:dy + R, dx:dx + W].reshape(R * W, C))
            patch = jnp.concatenate(cols, axis=1)  # (R*W, 9C)
            acc = jax.lax.dot_general(
                patch, w_ref[...].reshape(9 * C, C),
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        elif variant == "ztrick":
            # ONE wide-N dot (multi-MXU): z[p, tap*C+c] = xp[p] @ w[tap]
            # then 9 shifted adds select tap blocks (lane-block select is
            # free; only the dx sublane shift costs VPU)
            Rp, Wp = R + 2, W + 2
            w_all = w_ref[...].transpose(2, 0, 1, 3).reshape(C, 9 * C)
            z = jax.lax.dot_general(
                xp.reshape(Rp * Wp, C), w_all,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(x_hbm.dtype)
            z3 = z.reshape(Rp, Wp, 9, C)
            acc = jnp.zeros((R, W, C), jnp.float32)
            for dy in range(3):
                for dx in range(3):
                    acc = acc + z3[dy:dy + R, dx:dx + W, dy * 3 + dx]
            acc = acc.reshape(R * W, C)
        elif variant == "row3":
            # pack the 3 dx taps per dy: (R*W, 3C) x (3C, C), 3 dots
            acc = jnp.zeros((R * W, C), jnp.float32)
            for dy in range(3):
                cols = [xp[dy:dy + R, dx:dx + W].reshape(R * W, C)
                        for dx in range(3)]
                patch = jnp.concatenate(cols, axis=1)
                acc = acc + jax.lax.dot_general(
                    patch, w_ref[dy].reshape(3 * C, C),
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
        y_ref[...] = acc.reshape(1, R, W, C).astype(y_ref.dtype)

    def f(x, w):
        y = pl.pallas_call(
            kernel,
            grid=(n_tiles,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, R, W, C), lambda t: (0, t, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, n_tiles * R, W, C), x.dtype),
            scratch_shapes=[pltpu.VMEM((R + 2, W, C), x.dtype),
                            pltpu.SemaphoreType.DMA],
        )(x, w.astype(x.dtype))
        return y[:, :H]

    return f


def timeit(fn, x0, iters=20):
    y = fn(x0)
    jax.block_until_ready(y)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            y = fn(y)
        jax.block_until_ready(y)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1000.0


def main():
    rng = np.random.RandomState(0)
    w = jnp.asarray(rng.randn(3, 3, C, C).astype(np.float32) * 0.02)
    gf = 27904 * 9 * C * C * 2 / 1e9
    for dtype in (jnp.float32, jnp.bfloat16):
        x = jnp.asarray(rng.randn(1, H, W, C)).astype(dtype)
        print(f"--- {dtype.__name__} ---")
        for variant in ("ztrick", "im2col"):
            for R in (8,):
                g = make(variant, dtype, R)

                def chain(v):
                    for _ in range(N_CONV):
                        v = g(v, w)
                    return v

                try:
                    t = timeit(jax.jit(chain), x) / N_CONV
                    print(f"  {variant:7s} R={R:2d}: {t:.3f} ms/conv "
                          f"({gf / t:.0f} TF/s)")
                except Exception as e:
                    print(f"  {variant:7s} R={R:2d}: FAIL {str(e)[:100]}")


if __name__ == "__main__":
    main()
