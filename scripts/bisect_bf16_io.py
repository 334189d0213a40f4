"""Is the 1.6 ms/execution bf16 cost at the jit I/O boundary?
f32 I/O + internal bf16 compute vs bf16 I/O. Also matmul rates with
sane M-tiling and no astype barriers."""
import time

import numpy as np
import jax
import jax.numpy as jnp


def timeit(fn, *args, iters=20):
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
    x32 = jnp.asarray(rng.randn(1, 112, 256, 128).astype(np.float32))
    x16 = x32.astype(jnp.bfloat16)

    def tanh10_bf16_inside(v):
        h = v.astype(jnp.bfloat16)
        for _ in range(10):
            h = jnp.tanh(h)
        return h.astype(jnp.float32)

    def tanh10(v):
        for _ in range(10):
            v = jnp.tanh(v)
        return v

    print(f"f32 io, f32 compute : {timeit(jax.jit(tanh10), x32):.3f} ms")
    print(f"f32 io, bf16 inside : {timeit(jax.jit(tanh10_bf16_inside), x32):.3f} ms")
    print(f"bf16 io             : {timeit(jax.jit(tanh10), x16):.3f} ms")
    print(f"bf16 in, f32 out    : {timeit(jax.jit(lambda v: tanh10(v).astype(jnp.float32)), x16):.3f} ms")
    print(f"f32 in, bf16 out    : {timeit(jax.jit(lambda v: tanh10(v.astype(jnp.bfloat16))), x32):.3f} ms")

    # matmul rate, f32 I/O, bf16 compute, fori_loop to avoid big graphs
    m32 = jnp.asarray(rng.randn(27904, 128).astype(np.float32))
    w32 = jnp.asarray(rng.randn(128, 128).astype(np.float32))

    def mm_loop(v, w, n, dtype):
        vv = v.astype(dtype)
        ww = w.astype(dtype)

        def body(i, h):
            return jax.lax.dot_general(
                h, ww, (((1,), (0,)), ((), ())),
                preferred_element_type=dtype)

        return jax.lax.fori_loop(0, n, body, vv).astype(jnp.float32)

    for dtype, name in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
        t = timeit(jax.jit(lambda v, w, d=dtype: mm_loop(v, w, 100, d)),
                   m32, w32)
        gf = 100 * 27904 * 128 * 128 * 2 / 1e9
        print(f"matmul x100 {name} compute, f32 io: {t:.3f} ms ({gf / t:.1f} TF/s)")

    # bigger N: (27904, 128) x (128, 512)
    w5 = jnp.asarray(rng.randn(128, 512).astype(np.float32))
    wd = jnp.asarray(rng.randn(512, 128).astype(np.float32))

    def mm2_loop(v, n, dtype):
        vv = v.astype(dtype)
        wa, wb = w5.astype(dtype), wd.astype(dtype)

        def body(i, h):
            z = jax.lax.dot_general(h, wa, (((1,), (0,)), ((), ())),
                                    preferred_element_type=dtype)
            return jax.lax.dot_general(z, wb, (((1,), (0,)), ((), ())),
                                       preferred_element_type=dtype)

        return jax.lax.fori_loop(0, n, body, vv).astype(jnp.float32)

    for dtype, name in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
        t = timeit(jax.jit(lambda v, d=dtype: mm2_loop(v, 50, d)), m32)
        gf = 100 * 27904 * 128 * 512 * 2 / 1e9
        print(f"matmul128x512 x100 {name}, f32 io: {t:.3f} ms ({gf / t:.1f} TF/s)")


if __name__ == "__main__":
    main()
