"""Where do the 80 ms/iter go at the headline config (bf16, b16, 436x1024)?

Times each stage of the fast (layout-propagated) path at batch 16 plus the
batched Pallas res-block candidate, chained inside one jit (fori_loop) so
dispatch cannot overlap the measurement. Writes a JSON report.

Usage: python scripts/bisect_b16.py [out.json] [batch] [dtype]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from vst.kernels.layout import (
    s2d, d2s, s2d_conv_general, instance_norm_s2d, nearest_up2_s2d)
from vst.kernels.pallas_conv import res_block_pallas
from vst.nn.norm import instance_norm
from vst.ops.image import reflect_pad

K = 8
B, H, W = 16, 436, 1024
if len(sys.argv) > 2:
    B = int(sys.argv[2])
DTYPE = jnp.bfloat16
if len(sys.argv) > 3:
    DTYPE = jnp.dtype(sys.argv[3])


def chain(fn, x0, iters=3):
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
    rng = np.random.RandomState(0)
    report = {"device": str(jax.devices()[0]), "batch": B,
              "dtype": str(np.dtype(DTYPE))}

    def w_(kh, kw, ci, co):
        return jnp.asarray(
            rng.randn(kh, kw, ci, co).astype(np.float32) * .02).astype(DTYPE)

    def rec(name, fn, x):
        ms = chain(fn, x)
        report[name] = round(ms, 3)
        print(f"  {name:40s} {ms:8.3f} ms/iter ({ms / B:6.3f} ms/frame)")

    # stem (S4 layout)
    x = jnp.asarray(rng.rand(B, H, W, 3)).astype(DTYPE)
    rec("s2d4_in", lambda v: s2d(v, 4), x)
    xs = s2d(x, 4)
    w9 = w_(9, 9, 3, 32)
    rec("stem1_s2dconv", lambda v: s2d_conv_general(
        v, w9, a=4, stride=1, t_pad=4, pad_mode="reflect"), xs)
    h1 = jnp.asarray(rng.rand(B, H // 4, W // 4, 512)).astype(DTYPE)
    g1 = jnp.ones((32,), DTYPE)
    rec("in_s2d_32", lambda v: jax.nn.relu(
        instance_norm_s2d(v, 4, 32, g1, g1)), h1)
    w3 = w_(3, 3, 32, 64)
    rec("stem2_s2dconv", lambda v: s2d_conv_general(
        v, w3, a=4, stride=2, t_pad=1, pad_mode="reflect"), h1)
    h2 = jnp.asarray(rng.rand(B, H // 4, W // 4, 256)).astype(DTYPE)
    w3b = w_(3, 3, 64, 128)
    rec("stem3_s2dconv", lambda v: s2d_conv_general(
        v, w3b, a=2, stride=2, t_pad=1, pad_mode="reflect"), h2)

    # trunk (natural, 1/4 res): one res block, XLA vs batched Pallas
    C = 128
    ht = jnp.asarray(rng.rand(B, H // 4, W // 4, C)).astype(DTYPE)
    wt1, wt2 = w_(3, 3, C, C), w_(3, 3, C, C)
    bt = jnp.zeros((C,), DTYPE)
    gt = jnp.ones((C,), jnp.float32)

    def conv(v, w):
        return jax.lax.conv_general_dilated(
            reflect_pad(v, 1), w, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def res_xla(v):
        # gt is f32 (norm stats precision) — cast back before the next
        # bf16 conv or lax.conv rejects the mixed dtypes
        y = jax.nn.relu(
            instance_norm(conv(v, wt1) + bt) * gt + gt).astype(v.dtype)
        y = instance_norm(conv(y, wt2) + bt) * gt + gt
        return (0.8 * y + v).astype(v.dtype)

    rec("resblock_xla", res_xla, ht)
    rec("resblock_xla_zero_pad", lambda v: (lambda y: (0.8 * (
        instance_norm(jax.lax.conv_general_dilated(
            jax.nn.relu(instance_norm(y) * gt + gt).astype(v.dtype),
            wt2, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + bt) * gt + gt)
        + v).astype(v.dtype))(jax.lax.conv_general_dilated(
            v, wt1, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + bt), ht)
    try:
        rec("resblock_pallas", lambda v: res_block_pallas(
            v, wt1, bt, gt, gt, wt2, bt, gt, gt, jnp.float32(0.8)), ht)
    except Exception as e:  # noqa: BLE001
        report["resblock_pallas"] = f"{type(e).__name__}: {str(e)[:160]}"
        print("  resblock_pallas FAILED:", report["resblock_pallas"])
    rec("conv_only_xla", lambda v: conv(v, wt1) + bt, ht)
    rec("conv_only_zero_pad_same", lambda v: jax.lax.conv_general_dilated(
        v, wt1, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + bt, ht)

    # decoder (S layouts)
    rec("up2_s2d_128", lambda v: nearest_up2_s2d(v, 1, 128), ht)
    hu = jnp.asarray(rng.rand(B, H // 4, W // 4, 512)).astype(DTYPE)
    wd1 = w_(3, 3, 128, 64)
    rec("dec1_s2dconv", lambda v: s2d_conv_general(
        v, wd1, a=2, stride=1, t_pad=1, pad_mode="reflect"), hu)
    hv = jnp.asarray(rng.rand(B, H // 4, W // 4, 1024)).astype(DTYPE)
    wd2 = w_(3, 3, 64, 32)
    rec("dec2_s2dconv", lambda v: s2d_conv_general(
        v, wd2, a=4, stride=1, t_pad=1, pad_mode="reflect"), hv)
    hw = jnp.asarray(rng.rand(B, H // 4, W // 4, 512)).astype(DTYPE)
    wh = w_(9, 9, 32, 3)
    rec("head_s2dconv", lambda v: s2d_conv_general(
        v, wh, a=4, stride=1, t_pad=4, pad_mode="reflect"), hw)
    hh = jnp.asarray(rng.rand(B, H // 4, W // 4, 48)).astype(DTYPE)
    rec("d2s4_out", lambda v: d2s(v, 4, 3), hh)

    # natural-path stages (what FastStyleNet.apply runs — the b1 winner as
    # of bench r3d): full-res reflect-pad convs + nearest-up decoder
    def nat_conv(v, w, stride=1, t_pad=1):
        return jax.lax.conv_general_dilated(
            reflect_pad(v, t_pad), w, (stride, stride), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    xn = jnp.asarray(rng.rand(B, H, W, 3)).astype(DTYPE)
    rec("nat_stem1_conv9", lambda v: nat_conv(v, w9, 1, 4), xn)
    n1 = jnp.asarray(rng.rand(B, H, W, 32)).astype(DTYPE)
    g32 = jnp.ones((32,), jnp.float32)
    rec("nat_in_fullres_32", lambda v: jax.nn.relu(
        (instance_norm(v) * g32 + g32).astype(v.dtype)), n1)
    rec("nat_stem2_conv3_s2", lambda v: nat_conv(v, w3, 2, 1), n1)
    n2 = jnp.asarray(rng.rand(B, H // 2, W // 2, 64)).astype(DTYPE)
    rec("nat_stem3_conv3_s2", lambda v: nat_conv(v, w3b, 2, 1), n2)
    nh = jnp.asarray(rng.rand(B, H // 2, W // 2, 128)).astype(DTYPE)

    def up2(v):
        Bv, Hv, Wv, Cv = v.shape
        return jnp.broadcast_to(
            v[:, :, None, :, None, :], (Bv, Hv, 2, Wv, 2, Cv)
        ).reshape(Bv, Hv * 2, Wv * 2, Cv)

    rec("nat_dec1_up2_conv3", lambda v: nat_conv(up2(v), wd1, 1, 1), ht)
    nd = jnp.asarray(rng.rand(B, H // 2, W // 2, 64)).astype(DTYPE)
    rec("nat_dec2_up2_conv3", lambda v: nat_conv(up2(v), wd2, 1, 1), nd)
    nf = jnp.asarray(rng.rand(B, H, W, 32)).astype(DTYPE)
    rec("nat_head_conv9", lambda v: nat_conv(v, wh, 1, 4), nf)
    rec("nat_tanh_head", lambda v: jnp.tanh(v / 255.0) * 150.0 + 127.5, nf)

    # whole nets for cross-checking the sum
    from vst.models.faststyle import FastStyleNet
    from vst.models.faststyle_fast import fast_stylize
    m = FastStyleNet(n_styles=3)
    p = m.init(jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3), DTYPE), 1.0, 0)
    p = jax.tree.map(lambda a: a.astype(DTYPE), p["params"])
    rec("full_natural", lambda v: m.apply({"params": p}, v, 1.0, 0)[1], x)
    rec("full_fast_xla_trunk", lambda v: fast_stylize(
        p, v, 1.0, 0, n_styles=3)[1], x)
    try:
        rec("full_fast_pallas_trunk", lambda v: fast_stylize(
            p, v, 1.0, 0, n_styles=3, trunk="pallas")[1], x)
    except Exception as e:  # noqa: BLE001
        report["full_fast_pallas_trunk"] = f"{type(e).__name__}: {str(e)[:160]}"
        print("  full_fast_pallas_trunk FAILED:",
              report["full_fast_pallas_trunk"])

    out_path = sys.argv[1] if len(sys.argv) > 1 else "runs/bisect_b16.json"
    with open(out_path, "w") as f:
        json.dump(report, f, indent=2, sort_keys=True)
    print("wrote", out_path)


if __name__ == "__main__":
    main()
