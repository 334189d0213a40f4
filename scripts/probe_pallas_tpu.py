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


def _probe(name, fn, *args):
    try:
        out = jax.jit(fn)(*args)
        jax.tree.map(lambda a: np.asarray(a), out)
        return name, {"ok": True}
    except Exception as e:  # noqa: BLE001 — record the toolchain verdict
        msg = str(e)
        return name, {"ok": False, "error": f"{type(e).__name__}: {msg[:200]}"}


def main():
    report = {"device": str(jax.devices()[0])}
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(1, 64, 256, 64).astype(np.float32))
    w = jnp.asarray(rng.rand(3, 3, 64, 64).astype(np.float32) * 0.1)
    b = jnp.zeros((64,), jnp.float32)

    from vst.kernels.pallas_conv import (
        conv3x3_block_pallas, conv3x3_reflect, pallas_d2s, pallas_s2d,
        res_block_pallas, up2_conv_subpixel_pallas)

    g = jnp.ones((64,), jnp.float32)
    be = jnp.zeros((64,), jnp.float32)
    probes = [
        ("conv3x3_reflect", lambda: conv3x3_reflect(x, w, b)),
        ("conv3x3_block", lambda: conv3x3_block_pallas(x, w, b)[0]),
        ("res_block", lambda: res_block_pallas(x, w, b, g, be, w, b, g, be,
                                               jnp.float32(1.0))),
        ("up2_conv_subpixel", lambda: up2_conv_subpixel_pallas(x, w, b)),
        ("s2d_relayout", lambda: pallas_s2d(x, 4)),
        ("d2s_relayout", lambda: pallas_d2s(
            jnp.asarray(rng.rand(1, 16, 64, 64).astype(np.float32)), 4, 4)),
    ]
    for name, thunk in probes:
        k, v = _probe(name, thunk)
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
