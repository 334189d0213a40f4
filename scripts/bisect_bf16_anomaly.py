"""Why does every bf16 op at (1,109,256,128) cost ~0.19 ms? Separate
per-execution overhead from per-op cost; measure raw bf16 matmul rate."""
import time

import numpy as np
import jax
import jax.numpy as jnp


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
    for dtype in (jnp.float32, jnp.bfloat16):
        print(f"--- {dtype.__name__} ---")
        x = jnp.asarray(rng.randn(1, 109, 256, 128)).astype(dtype)
        for n in (1, 2, 10, 40):
            def g(v, n=n):
                for _ in range(n):
                    v = jnp.tanh(v)
                return v
            t = timeit(jax.jit(g), x)
            print(f"  tanh xN={n:3d}: total {t:.3f} ms  ({t / n:.4f} /op)")
        # aligned shape
        xa = jnp.asarray(rng.randn(1, 112, 256, 128)).astype(dtype)
        t = timeit(jax.jit(lambda v: jnp.tanh(v)), xa)
        print(f"  tanh aligned H=112: {t:.3f} ms")
        # matmul chain: (27904,128)x(128,128)
        m = jnp.asarray(rng.randn(27904, 128)).astype(dtype)
        w = jnp.asarray(rng.randn(128, 128)).astype(dtype)

        def mm(v):
            for _ in range(10):
                v = jax.lax.dot_general(v, w, (((1,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32
                                        ).astype(dtype)
            return v
        t = timeit(jax.jit(mm), m)
        gf = 10 * 27904 * 128 * 128 * 2 / 1e9
        print(f"  matmul x10: {t:.3f} ms  ({gf / t:.1f} TF/s)")
        # big matmul: K=1152 (im2col-scale)
        mk = jnp.asarray(rng.randn(27904, 1152)).astype(dtype)
        wk = jnp.asarray(rng.randn(1152, 128)).astype(dtype)

        def mm2(v):
            r = jax.lax.dot_general(v, wk, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            return (v + 0.0 * jnp.mean(r).astype(v.dtype))
        t = timeit(jax.jit(mm2), mk)
        gf = 27904 * 1152 * 128 * 2 / 1e9
        print(f"  matmul K=1152: {t:.3f} ms  ({gf / t:.1f} TF/s)")


if __name__ == "__main__":
    main()
