"""Pin the fixed per-op floor at the trunk shape: empty pallas kernel vs
tanh vs XLA VALID conv (no pad) vs the fused pad-conv kernel."""
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vst.kernels import pallas_conv as pc

H, W, C = 109, 256, 128
N = 10
R = 16


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


def passthrough_pallas(x):
    """Input block -> output block, auto-pipelined, no manual DMA."""
    def kernel(x_ref, y_ref):
        y_ref[...] = x_ref[...] * 1.0001

    n_tiles = pl.cdiv(H, R)
    y = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec((1, R, W, C), lambda t: (0, t, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, R, W, C), lambda t: (0, t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, n_tiles * R, W, C), x.dtype),
    )(x)
    return y[:, :H]


def main():
    rng = np.random.RandomState(0)
    w = jnp.asarray(rng.randn(3, 3, C, C).astype(np.float32) * 0.02)
    b = jnp.asarray(rng.randn(C).astype(np.float32) * 0.01)
    for dtype in (jnp.float32, jnp.bfloat16):
        x = jnp.asarray(rng.randn(1, H, W, C)).astype(dtype)
        print(f"--- {dtype.__name__} ---")

        def chain(f):
            def g(v):
                for _ in range(N):
                    v = f(v)
                return v
            return jax.jit(g)

        t = timeit(chain(lambda v: jnp.tanh(v)), x)
        print(f"  tanh only        {t / N:.3f} ms/op")
        t = timeit(chain(passthrough_pallas), x)
        print(f"  pallas passthru  {t / N:.3f} ms/op")
        t = timeit(chain(lambda v: jnp.tanh(jax.lax.conv_general_dilated(
            v, w.astype(v.dtype), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC")))), x)
        print(f"  XLA SAME conv    {t / N:.3f} ms/op")
        t = timeit(chain(lambda v: jnp.tanh(
            pc.conv3x3_reflect(v, w, b, row_tile=16))), x)
        print(f"  pallas fused     {t / N:.3f} ms/op")


if __name__ == "__main__":
    main()
