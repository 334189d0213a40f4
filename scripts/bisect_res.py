"""Res-trunk micro-bisection at the production shape (1, 109, 256, 128).

BENCH_r03 put the b1 gap at ~5x off roofline with the trunk as the top
stage (r2 table: enc+res 4.6 ms of 8.0). This isolates WHERE inside a
residual block the time goes and what each candidate XLA-level rewrite
buys, all with the chained fori_loop methodology (see bench.py):

  components:  reflect_pad / conv VALID / conv SAME / instance norm
  variants:    current block, zero-pad block, H=112-aligned block,
               E[x^2]-based single-pass IN, res x5 chain

Variants that change math (SAME zero-pad, aligned H) are measured for
DIAGNOSIS — production rewrites must keep reference parity.
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from vst.models.faststyle import ResidualBlock
from vst.ops.image import reflect_pad

K = 10


def chain(fn, x0, iters=4):
    def g(x):
        return x * (1.0 + 0.0 * jnp.mean(fn(x)).astype(x.dtype))

    loop = jax.jit(lambda x: jax.lax.fori_loop(0, K, lambda i, v: g(v), x))
    y = loop(x0)
    float(jnp.sum(y.astype(jnp.float32)))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        y = x0
        for _ in range(iters):
            y = loop(y)
        float(jnp.sum(y.astype(jnp.float32)))
        best = min(best, (time.perf_counter() - t0) / (iters * K))
    return best * 1000.0


def conv(x, w, padding="VALID"):
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, 1), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def inorm2(x, eps=1e-5):
    """Two-pass IN (mean then centered var) — flax-style."""
    m = jnp.mean(x, axis=(1, 2), keepdims=True)
    v = jnp.mean((x - m) ** 2, axis=(1, 2), keepdims=True)
    return (x - m) * jax.lax.rsqrt(v + eps)


def inorm1(x, eps=1e-5):
    """Single-pass IN via E[x^2] - E[x]^2 (both reductions fuse into one
    read of x). f32 accumulation for the squared sum."""
    xf = x.astype(jnp.float32)
    m = jnp.mean(xf, axis=(1, 2), keepdims=True)
    m2 = jnp.mean(xf * xf, axis=(1, 2), keepdims=True)
    v = m2 - m * m
    return ((xf - m) * jax.lax.rsqrt(v + eps)).astype(x.dtype)


def main():
    rng = np.random.RandomState(0)
    Hq, Wq, C = 109, 256, 128
    w1 = jnp.asarray(rng.randn(3, 3, C, C).astype(np.float32) * 0.02)
    w2 = jnp.asarray(rng.randn(3, 3, C, C).astype(np.float32) * 0.02)

    block = ResidualBlock(C)
    p = block.init(jax.random.PRNGKey(0),
                   jnp.zeros((1, Hq, Wq, C), jnp.float32), 1.0)["params"]

    def block_zero_pad(x):
        """Diagnosis: SAME zero-pad instead of reflect (different math)."""
        out = conv(x, w1, "SAME")
        out = jax.nn.relu(inorm2(out))
        out = conv(out, w2, "SAME")
        return inorm2(out) + x

    def block_reflect(x, norm):
        out = conv(reflect_pad(x, 1), w1)
        out = jax.nn.relu(norm(out))
        out = conv(reflect_pad(out, 1), w2)
        return norm(out) + x

    for dtype in (jnp.float32, jnp.bfloat16):
        P = jax.tree.map(lambda v: v.astype(dtype), p)
        x = jnp.asarray(rng.rand(1, Hq, Wq, C)).astype(dtype)
        x112 = jnp.asarray(rng.rand(1, 112, Wq, C)).astype(dtype)
        xp = reflect_pad(x, 1)

        rows = [
            ("reflect_pad alone", lambda v: reflect_pad(v, 1)[:, 1:-1, 1:-1],
             x),
            ("conv3x3 VALID alone (pre-padded)",
             lambda v: conv(v, w1)[:, :, :, :] * 1.0, xp),
            ("conv3x3 SAME alone", lambda v: conv(v, w1, "SAME"), x),
            ("IN two-pass alone", inorm2, x),
            ("IN one-pass alone", inorm1, x),
            ("block current (model apply)",
             lambda v: block.apply({"params": P}, v, 1.0), x),
            ("block reflect + IN2 (manual)",
             lambda v: block_reflect(v, inorm2), x),
            ("block reflect + IN1", lambda v: block_reflect(v, inorm1), x),
            ("block zero-pad SAME + IN2 (diag)", block_zero_pad, x),
            ("block current @H=112 (diag)",
             lambda v: block.apply({"params": P}, v, 1.0), x112),
        ]
        print(f"--- {dtype.__name__} @ (1,{Hq},{Wq},{C}) ---", flush=True)
        for name, fn, x0 in rows:
            print(f"  {name:36s} {chain(fn, x0):7.3f} ms", flush=True)

        def res5(v):
            for _ in range(5):
                v = block.apply({"params": P}, v, 1.0)
            return v

        print(f"  {'res x5 chain':36s} {chain(res5, x):7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
