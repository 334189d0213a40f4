"""Stage-wise bisection of Johnson b1 latency at 436x1024.

Each stage is timed with a self-consuming chained loop: g(x) = x·(1 +
0·mean(S(x))) keeps the loop variable input-shaped while forcing the full
stage compute every iteration (the tunneled platform needs chained timing —
see bench.py docstring)."""

import time

import numpy as np
import jax
import jax.numpy as jnp

from vst.models.faststyle import FastStyleNet, ResidualBlock
from vst.nn.conv import ConvLayer, UpsampleConvLayer, ConvTanh
from vst.models.faststyle import _Norm


K = 10  # stage reps inside ONE jit — amortizes the ~2 ms dispatch floor


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


def main():
    H, W = 436, 1024
    model = FastStyleNet(n_styles=3)
    p32 = model.init(jax.random.PRNGKey(0),
                     jnp.zeros((1, H, W, 3), jnp.float32), 1.0, 0)["params"]
    rng = np.random.RandomState(0)

    for dtype in (jnp.float32, jnp.bfloat16):
        P = jax.tree.map(lambda v: v.astype(dtype), p32)

        def inp(h, w, c):
            return jnp.asarray(rng.rand(1, h, w, c)).astype(dtype)

        def norm_relu(i):
            return lambda x: jax.nn.relu(
                _Norm(3).apply({"params": P[f"_Norm_{i}"]}, x, 0))

        stages = {
            "stem1 9x9->32 +IN": (
                lambda x: norm_relu(0)(ConvLayer(32, 9, stride=1).apply(
                    {"params": P["ConvLayer_0"]}, x)),
                inp(H, W, 3)),
            "stem2 3x3s2->64 +IN": (
                lambda x: norm_relu(1)(ConvLayer(64, 3, stride=2).apply(
                    {"params": P["ConvLayer_1"]}, x)),
                inp(H, W, 32)),
            "stem3 3x3s2->128 +IN": (
                lambda x: norm_relu(2)(ConvLayer(128, 3, stride=2).apply(
                    {"params": P["ConvLayer_2"]}, x)),
                inp(H // 2, W // 2, 64)),
            "res x5": (
                lambda x: _res5(P, x),
                inp(H // 4, W // 4, 128)),
            "dec1 up2conv->64 +IN": (
                lambda x: norm_relu(3)(
                    UpsampleConvLayer(64, 3, stride=1, upsample=2).apply(
                        {"params": P["UpsampleConvLayer_0"]}, x)),
                inp(H // 4, W // 4, 128)),
            "dec2 up2conv->32 +IN": (
                lambda x: norm_relu(4)(
                    UpsampleConvLayer(32, 3, stride=1, upsample=2).apply(
                        {"params": P["UpsampleConvLayer_1"]}, x)),
                inp(H // 2, W // 2, 64)),
            "head 9x9 tanh": (
                lambda x: ConvTanh(3, 9).apply({"params": P["ConvTanh_0"]}, x),
                inp(H, W, 32)),
        }
        total = 0.0
        print(f"--- {dtype.__name__} ---")
        for name, (fn, x0) in stages.items():
            t = chain(fn, x0)
            total += t
            print(f"  {name:24s} {t:7.3f} ms")
        print(f"  {'SUM':24s} {total:7.3f} ms")


def _res5(P, x):
    for j in range(5):
        x = ResidualBlock(128).apply(
            {"params": P[f"ResidualBlock_{j}"]}, x, 1.0)
    return x


if __name__ == "__main__":
    main()
