"""Compile-probe each Pallas kernel against the real TPU toolchain.

The CPU test tier runs every kernel in interpret mode, which validates
numerics but NOT Mosaic lowering — a kernel can pass all tests and still
be rejected by the TPU compiler (seen with the s2d/d2s register
relayouts: "infer-vector-layout: unsupported shape cast"). This script
jit-compiles each kernel (tiny shapes, one execution) and writes a JSON
report so the opt-in gates in vst/kernels can be flipped with evidence.

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
    and (when given) its XLA-reference implementation of the same math."""
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
        # Mosaic-acceptance verdict (the whole point of this report)
        try:
            rec["xla_ms"] = round(_time(jax.jit(ref)), 4)
        except Exception as e:  # noqa: BLE001
            rec["xla_error"] = f"{type(e).__name__}: {str(e)[:120]}"
    return name, rec


def main():
    report = {"device": str(jax.devices()[0])}
    rng = np.random.RandomState(0)
    # PRODUCTION shapes: the Johnson b1 trunk/decoder stages at 436×1024
    # (trunk (1,109,256,128); dec1 →(218,512,64); dec2 →(436,1024,32))
    x = jnp.asarray(rng.rand(1, 109, 256, 128).astype(np.float32))
    w = jnp.asarray(rng.rand(3, 3, 128, 128).astype(np.float32) * 0.1)
    b = jnp.zeros((128,), jnp.float32)
    wd1 = jnp.asarray(rng.rand(3, 3, 128, 64).astype(np.float32) * 0.1)
    bd1 = jnp.zeros((64,), jnp.float32)
    xd2 = jnp.asarray(rng.rand(1, 218, 512, 64).astype(np.float32))
    wd2 = jnp.asarray(rng.rand(3, 3, 64, 32).astype(np.float32) * 0.1)
    bd2 = jnp.zeros((32,), jnp.float32)

    from vst.kernels.pallas_conv import (
        conv3x3_block_pallas, conv3x3_reflect, conv3x3_reflect_ref,
        res_block_pallas, up2_conv_subpixel_pallas)
    from vst.kernels.layout import up2_conv_subpixel
    from vst.nn.norm import instance_norm

    g = jnp.ones((128,), jnp.float32)
    be = jnp.zeros((128,), jnp.float32)

    def res_block_xla(h):
        t = jax.nn.relu(instance_norm(conv3x3_reflect_ref(h, w, b)) * g + be)
        t = instance_norm(conv3x3_reflect_ref(t, w, b)) * g + be
        return 1.0 * t + h

    from vst.kernels.layout import d2s as d2s_xla
    from vst.kernels.layout import s2d as s2d_xla
    from vst.kernels.layout import d2s_via_conv, s2d_via_conv

    # stem1 s2d (padded input) and head d2s at the real shapes
    xt = jnp.asarray(rng.rand(1, 444, 1032, 3).astype(np.float32))
    xh = jnp.asarray(rng.rand(1, 109, 256, 48).astype(np.float32))
    xb16 = jnp.asarray(rng.rand(16, 109, 256, 128).astype(np.float32))
    probes = [
        ("conv3x3_reflect", lambda: conv3x3_reflect(x, w, b),
         lambda: conv3x3_reflect_ref(x, w, b)),
        ("conv3x3_block", lambda: conv3x3_block_pallas(x, w, b)[0], None),
        ("res_block", lambda: res_block_pallas(x, w, b, g, be, w, b, g, be,
                                               jnp.float32(1.0)),
         lambda: res_block_xla(x)),
        ("res_block_r8", lambda: res_block_pallas(
            x, w, b, g, be, w, b, g, be, jnp.float32(1.0), row_tile=8),
         None),
        ("res_block_b16", lambda: res_block_pallas(
            xb16, w, b, g, be, w, b, g, be, jnp.float32(1.0)),
         lambda: res_block_xla(xb16)),
        ("up2_dec1", lambda: up2_conv_subpixel_pallas(x, wd1, bd1),
         lambda: up2_conv_subpixel(x, wd1) + bd1),
        ("up2_dec2", lambda: up2_conv_subpixel_pallas(xd2, wd2, bd2),
         lambda: up2_conv_subpixel(xd2, wd2) + bd2),
        ("up2_dec2_r16",
         lambda: up2_conv_subpixel_pallas(xd2, wd2, bd2, row_tile=16), None),
        # pallas_{s2d,d2s} are illegal at the stem/head shapes (the f·C=12
        # channel slab can't block the 48-lane axis); probe the identity-
        # conv relayout (vst.kernels.layout.{s2d,d2s}_via_conv) instead
        ("s2d_via_conv", lambda: s2d_via_conv(xt, 4),
         lambda: s2d_xla(xt, 4)),
        ("d2s_via_conv", lambda: d2s_via_conv(xh, 4, 3),
         lambda: d2s_xla(xh, 4, 3)),
    ]
    for entry in probes:
        name, thunk, ref = entry
        k, v = _probe(name, thunk, ref)
        report[k] = v
        print(name, v)

    from vst.kernels.pallas_corr import pallas_lookup_level  # RAFT lookup
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
