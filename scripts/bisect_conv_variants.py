"""Conv-algorithm shootout for the slow FastStyleNet stages (b1, f32+bf16).

Variants per stage:
  xla     — lax.conv as the model runs it today
  im2col  — explicit tap-slices + one big dot_general
  s2dK    — space-to-depth phase rewrite (stride folded into channels)
  bchw    — NCHW dimension numbers
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

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


def conv(x, w, stride=1, padding="VALID"):
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (stride, stride), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def conv_nchw(x, w, stride=1):
    xc = jnp.transpose(x, (0, 3, 1, 2))
    wc = jnp.transpose(w, (3, 2, 0, 1)).astype(x.dtype)
    y = jax.lax.conv_general_dilated(
        xc, wc, (stride, stride), "VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    return jnp.transpose(y, (0, 2, 3, 1))


def im2col_s2(xp, w):
    """Stride-2 3x3 conv on pre-padded xp (1, H+2, W+2, C) via one matmul."""
    _, Hp, Wp, C = xp.shape
    Ho, Wo = (Hp - 3) // 2 + 1, (Wp - 3) // 2 + 1
    taps = []
    for dy in range(3):
        for dx in range(3):
            t = jax.lax.slice(xp, (0, dy, dx, 0),
                              (1, dy + 2 * Ho - 1, dx + 2 * Wo - 1, C),
                              (1, 2, 2, 1))
            taps.append(t.reshape(Ho * Wo, C))
    big = jnp.concatenate(taps, axis=1)
    wm = w.astype(xp.dtype).reshape(9 * C, -1)
    y = jax.lax.dot_general(big, wm, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    return y.reshape(1, Ho, Wo, -1).astype(xp.dtype)


def im2col_s1(xp, w):
    _, Hp, Wp, C = xp.shape
    kh, kw = w.shape[0], w.shape[1]
    Ho, Wo = Hp - kh + 1, Wp - kw + 1
    taps = []
    for dy in range(kh):
        for dx in range(kw):
            t = jax.lax.slice(xp, (0, dy, dx, 0), (1, dy + Ho, dx + Wo, C))
            taps.append(t.reshape(Ho * Wo, C))
    big = jnp.concatenate(taps, axis=1)
    wm = w.astype(xp.dtype).reshape(kh * kw * C, -1)
    y = jax.lax.dot_general(big, wm, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    return y.reshape(1, Ho, Wo, -1).astype(xp.dtype)


def s2_via_s2d(x, w):
    """Stride-2 3x3 conv == stride-1 2x2 conv over s2d(2) with rearranged
    weights. x natural (1,H,W,C) unpadded interior-only check variant uses
    SAME-ish zero pad for speed comparison (math differs at border; this is
    a SPEED probe only)."""
    _, H, W, C = x.shape
    xs = x.reshape(1, H // 2, 2, W // 2, 2, C).transpose(0, 1, 3, 2, 4, 5)
    xs = xs.reshape(1, H // 2, W // 2, 4 * C)
    # build 2x2 S-kernel: S[By, Bx, (py,px,c), co] from w[3,3,C,co];
    # tap (ky,kx) reads input pixel 2r+ky-1 = 2(r+By)+py with ky-1 = 2By+py-? —
    # offset o = ky-1 ∈ {-1,0,1}; o+1 ∈ {0,1,2} → block B=(o+1)//2? No: block
    # index relative to output block r is floor(o/2) after phase split:
    # o = 2B+p with p∈{0,1} → B = (o - p)/2, p = o mod 2 (floor semantics).
    Co = w.shape[-1]
    wj = w.astype(x.dtype)
    S = jnp.zeros((2, 2, 4 * C, Co), x.dtype)
    for ky in range(3):
        for kx in range(3):
            oy, ox = ky - 1, kx - 1
            py, px = oy % 2, ox % 2
            By, Bx = (oy - py) // 2, (ox - px) // 2  # ∈ {-1, 0}
            S = S.at[By + 1, Bx + 1,
                     (py * 2 + px) * C:(py * 2 + px + 1) * C, :].set(
                wj[ky, kx])
    return conv(xs, S, 1, "SAME")


def main():
    H, W = 436, 1024
    rng = np.random.RandomState(0)

    for dtype in (jnp.float32, jnp.bfloat16):
        print(f"===== {dtype.__name__} =====")

        def w_(kh, kw, ci, co):
            return jnp.asarray(
                rng.randn(kh, kw, ci, co).astype(np.float32) * .02)

        def t(name, fn, x):
            print(f"  {name:40s} {chain(fn, x.astype(dtype)):7.3f} ms")

        print("--- res conv 3x3 128->128 @109x256 (control) ---")
        x = jnp.asarray(rng.rand(1, H // 4 + 2, W // 4 + 2, 128), np.float32)
        wr = w_(3, 3, 128, 128)
        t("xla prepadded", lambda v: conv(v, wr), x)
        t("im2col prepadded", lambda v: im2col_s1(v, wr), x)

        print("--- stem2 3x3 s2 32->64 @436x1024 ---")
        xp = jnp.asarray(rng.rand(1, H + 2, W + 2, 32), np.float32)
        w3 = w_(3, 3, 32, 64)
        t("xla prepadded", lambda v: conv(v, w3, 2), xp)
        t("im2col prepadded", lambda v: im2col_s2(v, w3), xp)
        x = jnp.asarray(rng.rand(1, H, W, 32), np.float32)
        t("s2d2 rewrite (speed probe)", lambda v: s2_via_s2d(v, w3), x)
        t("nchw prepadded", lambda v: conv_nchw(v, w3, 2), xp)

        print("--- stem3 3x3 s2 64->128 @218x512 ---")
        xp = jnp.asarray(rng.rand(1, H // 2 + 2, W // 2 + 2, 64), np.float32)
        w3b = w_(3, 3, 64, 128)
        t("xla prepadded", lambda v: conv(v, w3b, 2), xp)
        t("im2col prepadded", lambda v: im2col_s2(v, w3b), xp)

        print("--- dec2 coarse conv 3x3 64->128 @218x512 ---")
        xp = jnp.asarray(rng.rand(1, H // 2 + 2, W // 2 + 2, 64), np.float32)
        wf = w_(3, 3, 64, 128)
        t("xla prepadded", lambda v: conv(v, wf), xp)
        t("im2col prepadded", lambda v: im2col_s1(v, wf), xp)

        print("--- dec1 coarse conv 3x3 128->256 @109x256 ---")
        xp = jnp.asarray(rng.rand(1, H // 4 + 2, W // 4 + 2, 128), np.float32)
        wd = w_(3, 3, 128, 256)
        t("xla prepadded", lambda v: conv(v, wd), xp)
        t("im2col prepadded", lambda v: im2col_s1(v, wd), xp)


if __name__ == "__main__":
    main()
