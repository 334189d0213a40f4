"""In-pallas matmul TF/s vs N and K: does Mosaic engage multiple MXUs
only for wide N (or deep K)? M=4096 fixed (one row tile's pixels)."""
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

M = 4096
REPS = 64


def make(K, N, dtype, taps=1):
    def kernel(x_ref, w_ref, y_ref):
        acc = jnp.zeros((M, N), jnp.float32)

        def body(i, acc):
            return acc + jax.lax.dot_general(
                x_ref[...], w_ref[...], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        acc = jax.lax.fori_loop(0, REPS, body, acc)
        y_ref[...] = acc.astype(y_ref.dtype)

    def f(x, w):
        return pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((M, N), x.dtype),
        )(x, w)

    return f


def timeit(fn, *args, iters=10):
    y = fn(*args)
    jax.block_until_ready(y)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            y = fn(*args)
        jax.block_until_ready(y)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1000.0


def main():
    rng = np.random.RandomState(0)
    for dtype in (jnp.bfloat16, jnp.float32):
        print(f"--- {dtype.__name__} ---")
        for (K, N) in ((128, 128), (128, 256), (128, 512), (128, 1024),
                       (256, 128), (512, 128), (1152, 128),
                       (512, 512), (256, 256)):
            x = jnp.asarray(rng.randn(M, K)).astype(dtype)
            w = jnp.asarray(rng.randn(K, N)).astype(dtype)
            try:
                t = timeit(make(K, N, dtype), x, w)
                gf = REPS * M * K * N * 2 / 1e9
                print(f"  K={K:5d} N={N:5d}: {t:7.3f} ms ({gf / t:.0f} TF/s)")
            except Exception as e:
                print(f"  K={K:5d} N={N:5d}: FAIL {str(e)[:90]}")


if __name__ == "__main__":
    main()
