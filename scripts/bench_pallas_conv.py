"""Isolated benchmark: Pallas fused reflect-pad conv3x3 vs XLA at the
FastStyleNet residual-trunk shape (436x1024 input -> 109x256x128 trunk).

Times a 10-conv chain (the 5 res-blocks' convs) INSIDE one jit program so
per-dispatch tunnel overhead (~1 ms on the axon link) doesn't drown the
kernel comparison, then divides by 10."""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from vst.kernels import pallas_conv as pc

N_CONV = 10


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
    H, W, C = 109, 256, 128
    rng = np.random.RandomState(0)
    w = jnp.asarray(rng.randn(3, 3, C, C).astype(np.float32) * 0.02)
    b = jnp.asarray(rng.randn(C).astype(np.float32) * 0.01)

    def chain_ref(x):
        for _ in range(N_CONV):
            x = jnp.tanh(pc.conv3x3_reflect_ref(x, w, b))
        return x

    def make_chain_pallas(rt):
        def f(x):
            for _ in range(N_CONV):
                x = jnp.tanh(pc.conv3x3_reflect(x, w, b, row_tile=rt))
            return x
        return f

    for dtype in (jnp.float32, jnp.bfloat16):
        x = jnp.asarray(rng.randn(1, H, W, C)).astype(dtype)
        ref = jax.jit(chain_ref)
        t_ref = timeit(ref, x)
        print(f"{dtype.__name__}: XLA chain {t_ref:.3f} ms "
              f"({t_ref / N_CONV:.3f} ms/conv)")
        y1 = np.asarray(ref(x), np.float32)
        for rt in (8, 16, 32):
            try:
                f = jax.jit(make_chain_pallas(rt))
                t = timeit(f, x)
                y0 = np.asarray(f(x), np.float32)
                err = np.abs(y0 - y1).max() / (np.abs(y1).max() + 1e-9)
                print(f"  pallas rt={rt}: {t:.3f} ms "
                      f"({t / N_CONV:.3f} ms/conv)  rel_err={err:.2e}")
            except Exception as e:
                print(f"  pallas rt={rt}: FAIL {type(e).__name__}: {e}"[:300])


if __name__ == "__main__":
    main()
