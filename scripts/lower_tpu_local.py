"""Local (no-TPU) Mosaic lowering rig.

Cross-platform AOT lowering (`jit(f).trace(...).lower(platforms=("tpu",))`)
runs the CLIENT-side Pallas→Mosaic lowering pipeline — the layer that
raised the s2d/d2s block-shape ValueErrors on the real chip — without
touching the axon relay. It does NOT exercise the server-side Mosaic→LLO
compile (the `tpu_compile_helper exit 1` class), but it catches every
shape/layout/lowering rejection for free on CPU.

Usage: python scripts/lower_tpu_local.py  (JAX_PLATFORMS=cpu ok)
"""

import sys
import traceback

import numpy as np

import jax
import jax.numpy as jnp

# the kernels force interpret=True when default_backend() == "cpu";
# defeat that so the real TPU lowering path runs
_real_default_backend = jax.default_backend
jax.default_backend = lambda: "tpu"


def probe(name, fn, *args):
    try:
        jax.jit(fn).trace(*args).lower(lowering_platforms=("tpu",))
        print(f"{name}: LOWER-OK")
        return True
    except Exception as e:  # noqa: BLE001
        msg = str(e).split("\n")
        print(f"{name}: FAIL {type(e).__name__}: " + " | ".join(msg[:12]))
        if "--tb" in sys.argv:
            traceback.print_exc()
        return False


def main():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(1, 109, 256, 128).astype(np.float32))
    w = jnp.asarray(rng.rand(3, 3, 128, 128).astype(np.float32) * 0.1)
    b = jnp.zeros((128,), jnp.float32)
    wd1 = jnp.asarray(rng.rand(3, 3, 128, 64).astype(np.float32) * 0.1)
    bd1 = jnp.zeros((64,), jnp.float32)
    xd2 = jnp.asarray(rng.rand(1, 218, 512, 64).astype(np.float32))
    wd2 = jnp.asarray(rng.rand(3, 3, 64, 32).astype(np.float32) * 0.1)
    bd2 = jnp.zeros((32,), jnp.float32)
    xt = jnp.asarray(rng.rand(1, 444, 1032, 3).astype(np.float32))
    xh = jnp.asarray(rng.rand(1, 109, 256, 48).astype(np.float32))

    from vst.kernels.pallas_conv import (
        conv3x3_block_pallas, conv3x3_reflect, pallas_d2s, pallas_s2d,
        res_block_pallas, up2_conv_subpixel_pallas)

    g = jnp.ones((128,), jnp.float32)
    be = jnp.zeros((128,), jnp.float32)

    probe("conv3x3_reflect",
          lambda x, w, b: conv3x3_reflect(x, w, b), x, w, b)
    probe("conv3x3_block",
          lambda x, w, b: conv3x3_block_pallas(x, w, b)[0], x, w, b)
    probe("res_block",
          lambda x: res_block_pallas(x, w, b, g, be, w, b, g, be,
                                     jnp.float32(1.0)), x)
    probe("up2_dec1", lambda x: up2_conv_subpixel_pallas(x, wd1, bd1), x)
    probe("up2_dec2", lambda x: up2_conv_subpixel_pallas(x, wd2, bd2), xd2)
    probe("s2d_relayout", lambda x: pallas_s2d(x, 4), xt)
    probe("d2s_relayout", lambda x: pallas_d2s(x, 4, 3), xh)

    from vst.kernels.pallas_corr import pallas_lookup_level
    corr = jnp.asarray(rng.rand(512, 32, 64, 1).astype(np.float32))
    coords = jnp.asarray(rng.rand(512, 2).astype(np.float32) * 16)
    probe("corr_lookup_level",
          lambda c, q: pallas_lookup_level(c, q, 4, 0), corr, coords)


if __name__ == "__main__":
    main()
