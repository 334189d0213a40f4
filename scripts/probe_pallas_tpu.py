"""Probe every surviving vst.kernels fast path against the real TPU
toolchain at its PRODUCTION shape, timing it against the XLA-natural
implementation of the same math.

The CPU test tier runs the Pallas corr kernel in interpret mode, which
validates numerics but NOT Mosaic lowering; and the conv-algebra paths
(s2d stem, subpixel decoder) are exact XLA rewrites whose value is purely
empirical — this report is the evidence that each kernel left in the tree
beats XLA's natural lowering (VERDICT r3 item 2: kill-or-fix; the losing
Pallas conv/res-block estate was deleted in round 4).

Usage: python scripts/probe_pallas_tpu.py [out.json]
"""

import json
import sys

import numpy as np
import jax
import jax.numpy as jnp


def _time(fn, iters=30):
    import time

    jax.tree.map(lambda a: np.asarray(a), fn())  # warm + sync
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = fn()
        jax.tree.map(lambda a: np.asarray(a), out)  # end-of-window sync
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1000.0


def _probe(name, fn, ref=None):
    """Compile+run verdict, plus isolated best-of-3 timings for the kernel
    and (when given) its XLA-natural implementation of the same math."""
    try:
        jitted = jax.jit(fn)
        out = jitted()
        jax.tree.map(lambda a: np.asarray(a), out)
        rec = {"ok": True, "ms": round(_time(jitted), 4)}
    except Exception as e:  # noqa: BLE001 — record the toolchain verdict
        msg = str(e)
        return name, {"ok": False, "error": f"{type(e).__name__}: {msg[:200]}"}
    if ref is not None:
        # own try: a reference-path failure must not corrupt the kernel's
        # acceptance verdict (the whole point of this report)
        try:
            rec["xla_ms"] = round(_time(jax.jit(ref)), 4)
        except Exception as e:  # noqa: BLE001
            rec["xla_error"] = f"{type(e).__name__}: {str(e)[:120]}"
    return name, rec


def main():
    report = {"device": str(jax.devices()[0])}
    rng = np.random.RandomState(0)

    from vst.kernels.layout import (
        d2s, d2s_via_conv, s2d, s2d_via_conv, up2_conv_subpixel)
    from vst.kernels.s2d_conv import s2d_conv2d
    from vst.ops.image import reflect_pad, resize_nearest

    # -- 9×9 stem/head (ConvLayer k≥7 fast path) at Sintel res -------------
    xs = jnp.asarray(rng.rand(1, 444, 1032, 3).astype(np.float32))  # padded
    ws = jnp.asarray(rng.rand(9, 9, 3, 32).astype(np.float32) * 0.1)

    def stem_xla():
        return jax.lax.conv_general_dilated(
            xs, ws, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    k, v = _probe("stem9x9_s2d", lambda: s2d_conv2d(xs, ws, f=4), stem_xla)
    report[k] = v
    print(k, v)

    # -- subpixel decoder stages (UpsampleConvLayer fast path) -------------
    xd1 = jnp.asarray(rng.rand(1, 109, 256, 128).astype(np.float32))
    wd1 = jnp.asarray(rng.rand(3, 3, 128, 64).astype(np.float32) * 0.1)
    xd2 = jnp.asarray(rng.rand(1, 218, 512, 64).astype(np.float32))
    wd2 = jnp.asarray(rng.rand(3, 3, 64, 32).astype(np.float32) * 0.1)

    def up2_naive(x, w):
        v = reflect_pad(resize_nearest(x, 2), 1)
        return jax.lax.conv_general_dilated(
            v, w, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    for nm, x, w in (("up2_dec1", xd1, wd1), ("up2_dec2", xd2, wd2)):
        k, v = _probe(f"{nm}_subpixel", lambda x=x, w=w: up2_conv_subpixel(x, w),
                      lambda x=x, w=w: up2_naive(x, w))
        report[k] = v
        print(k, v)

    # -- identity-conv layout passes vs reshape∘transpose ------------------
    xh = jnp.asarray(rng.rand(1, 109, 256, 48).astype(np.float32))
    k, v = _probe("s2d_via_conv", lambda: s2d_via_conv(xs, 4),
                  lambda: s2d(xs, 4))
    report[k] = v
    print(k, v)
    k, v = _probe("d2s_via_conv", lambda: d2s_via_conv(xh, 4, 3),
                  lambda: d2s(xh, 4, 3))
    report[k] = v
    print(k, v)

    # -- RAFT correlation-window lookup ------------------------------------
    from vst.kernels.pallas_corr import pallas_lookup_level

    corr = jnp.asarray(rng.rand(512, 32, 64, 1).astype(np.float32))
    coords = jnp.asarray(rng.rand(512, 2).astype(np.float32) * 16)
    k, v = _probe("corr_lookup_level",
                  lambda: pallas_lookup_level(corr, coords, 4, 0))
    report[k] = v
    print(k, v)

    out_path = sys.argv[1] if len(sys.argv) > 1 else "artifacts/pallas_probe.json"
    with open(out_path, "w") as f:
        json.dump(report, f, indent=2, sort_keys=True)
    print("wrote", out_path)


if __name__ == "__main__":
    main()
