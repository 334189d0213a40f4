"""Isolate pad vs conv vs layout cost in the slow FastStyleNet stages.
All timings amortized inside one jit (fori_loop, K reps)."""

import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from vst.ops.image import reflect_pad
from vst.kernels.s2d_conv import s2d_conv2d
from vst.kernels.layout import up2_conv_subpixel, s2d, d2s

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


def conv(x, w, stride=1, padding="VALID"):
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (stride, stride), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def main():
    H, W = 436, 1024
    rng = np.random.RandomState(0)
    dtype = jnp.float32

    def t(name, fn, x):
        print(f"  {name:44s} {chain(fn, x):7.3f} ms")

    def w_(kh, kw, ci, co):
        return jnp.asarray(rng.randn(kh, kw, ci, co).astype(np.float32) * .02)

    print("--- stem1: 9x9 s1 3->32 @436x1024 ---")
    x = jnp.asarray(rng.rand(1, H, W, 3), np.float32)
    w9 = w_(9, 9, 3, 32)
    t("natural XLA SAME zero-pad", lambda v: conv(v, w9, 1, "SAME"), x)
    t("reflect_pad + natural XLA", lambda v: conv(reflect_pad(v, 4), w9), x)
    t("s2d_conv2d f=4 (current, incl pads)",
      lambda v: s2d_conv2d(reflect_pad(v, 4), w9, f=4), x)

    print("--- stem2: 3x3 s2 32->64 @436x1024 ---")
    x = jnp.asarray(rng.rand(1, H, W, 32), np.float32)
    w3 = w_(3, 3, 32, 64)
    t("zero-pad SAME conv s2", lambda v: conv(v, w3, 2, "SAME"), x)
    t("reflect_pad + conv s2 (current)",
      lambda v: conv(reflect_pad(v, 1), w3, 2), x)
    xp = jnp.asarray(rng.rand(1, H + 2, W + 2, 32), np.float32)
    t("conv s2 only (pre-padded)", lambda v: conv(v, w3, 2), xp)

    print("--- stem3: 3x3 s2 64->128 @218x512 ---")
    x = jnp.asarray(rng.rand(1, H // 2, W // 2, 64), np.float32)
    w3b = w_(3, 3, 64, 128)
    t("reflect_pad + conv s2 (current)",
      lambda v: conv(reflect_pad(v, 1), w3b, 2), x)
    t("zero-pad SAME conv s2", lambda v: conv(v, w3b, 2, "SAME"), x)

    print("--- dec1: up2+conv 128->64 @109x256 -> 218x512 ---")
    x = jnp.asarray(rng.rand(1, H // 4, W // 4, 128), np.float32)
    wd = w_(3, 3, 128, 64)
    t("up2_conv_subpixel (current)", lambda v: up2_conv_subpixel(v, wd), x)

    print("--- dec2: up2+conv 64->32 @218x512 -> 436x1024 ---")
    x = jnp.asarray(rng.rand(1, H // 2, W // 2, 64), np.float32)
    wd2 = w_(3, 3, 64, 32)
    t("up2_conv_subpixel (current)", lambda v: up2_conv_subpixel(v, wd2), x)
    # decompose: conv at coarse res to 4*32 ch, then d2s
    wf = w_(3, 3, 64, 128)
    t("  coarse conv3x3 64->128 only",
      lambda v: conv(reflect_pad(v, 1), wf), x)
    y = jnp.asarray(rng.rand(1, H // 2, W // 2, 128), np.float32)
    t("  d2s only 128ch@218x512 -> 32@436x1024",
      lambda v: d2s(v, 2, 32), y)

    print("--- head: 9x9 s1 32->3 @436x1024 ---")
    x = jnp.asarray(rng.rand(1, H, W, 32), np.float32)
    wh = w_(9, 9, 32, 3)
    t("natural XLA SAME", lambda v: conv(v, wh, 1, "SAME"), x)
    t("s2d_conv2d f=4 (current, incl pads)",
      lambda v: s2d_conv2d(reflect_pad(v, 4), wh, f=4), x)
    print("--- layout passes @436x1024x32 f32 ---")
    t("s2d(4) 32ch", lambda v: s2d(v, 4), x)


if __name__ == "__main__":
    main()
