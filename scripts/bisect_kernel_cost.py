"""Which part of the fused pad-conv kernel costs 0.2 ms: the 9 shifted tap
copies (VPU) or the 9 matmuls (MXU)? Timing-only variants with wrong math."""
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

H, W, C = 109, 256, 128
N_CONV = 10


def make(variant, dtype, R=16):
    n_tiles = pl.cdiv(H, R)

    def refl(r):
        return jnp.where(r < 0, -r, jnp.where(r >= H, 2 * H - 2 - r, r))

    def kernel(x_hbm, w_ref, y_ref, xbuf, sem):
        r0 = pl.program_id(0) * R

        def row_copy(i):
            return pltpu.make_async_copy(
                x_hbm.at[0, pl.ds(refl(r0 - 1 + i), 1)],
                xbuf.at[pl.ds(i, 1)], sem)

        jax.lax.fori_loop(0, R + 2, lambda i, _: (row_copy(i).start(), 0)[1], 0)
        jax.lax.fori_loop(0, R + 2, lambda i, _: (row_copy(i).wait(), 0)[1], 0)
        xv = xbuf[...]
        xp = jnp.concatenate([xv[:, 1:2], xv, xv[:, W - 2:W - 1]], axis=1)
        acc = jnp.zeros((R * W, C), jnp.float32)
        if variant == "full":
            for dy in range(3):
                for dx in range(3):
                    tap = xp[dy:dy + R, dx:dx + W]
                    acc = acc + jax.lax.dot_general(
                        tap.reshape(R * W, C), w_ref[dy, dx],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
        elif variant == "mxu_only":  # no shifts: same tap 9×
            tap = xp[0:R, 0:W].reshape(R * W, C)
            for dy in range(3):
                for dx in range(3):
                    acc = acc + jax.lax.dot_general(
                        tap, w_ref[dy, dx], (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
        elif variant == "shift_only":  # shifts, no matmul
            for dy in range(3):
                for dx in range(3):
                    tap = xp[dy:dy + R, dx:dx + W]
                    acc = acc + tap.reshape(R * W, C).astype(jnp.float32)
        elif variant == "dma_only":
            acc = acc + xp[0:R, 0:W].reshape(R * W, C).astype(jnp.float32)
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
    for dtype in (jnp.float32, jnp.bfloat16):
        x = jnp.asarray(rng.randn(1, H, W, C)).astype(dtype)
        print(f"--- {dtype.__name__} ---")
        for variant in ("dma_only", "shift_only", "mxu_only", "full"):
            g = make(variant, dtype)

            def chain(v):
                for _ in range(N_CONV):
                    v = g(v, w)
                return v

            try:
                t = timeit(jax.jit(chain), x)
                print(f"  {variant:12s} {t / N_CONV:.3f} ms/conv")
            except Exception as e:
                print(f"  {variant:12s} FAIL {str(e)[:120]}")


if __name__ == "__main__":
    main()
