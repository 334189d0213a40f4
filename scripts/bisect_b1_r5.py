"""Round-5 b1 latency bisect: where do the 6.1 bf16 / 7.6 f32 ms go,
and does row-padding 436->448 (whole-net 8-sublane alignment: the conv
grids become 448/224/112 instead of 436/218/109) buy anything?

The r2 stage split (enc+res 4.6, dec 2.3, head 0.6 of f32 8.0) predates
the s2d stem, subpixel decoder and one-pass IN stats. Rebuild it on the
current tree, then A/B the full net at H=436 vs replicate-pad-448+crop.

Run ON THE TPU (queue job). Chained-loop timing, scalar-fetch sync.
"""

import json
import time

import numpy as np
import jax
import jax.numpy as jnp

from vst.models.faststyle import FastStyleNet
from vst.ops.image import replicate_pad

H, W = 436, 1024
ITERS = 30


def timeit(fn, *args):
    x = fn(*args)
    float(jnp.asarray(x).sum())  # compile + sync
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(ITERS):
            x = fn(*args)
        float(jnp.asarray(x).sum())
        best = min(best, (time.perf_counter() - t0) / ITERS)
    return best * 1000.0


def main():
    out = {"device": str(jax.devices()[0]), "iters": ITERS, "hw": [H, W]}
    model = FastStyleNet(n_styles=3)
    for dtype, tag in ((jnp.bfloat16, "bf16"), (jnp.float32, "f32")):
        params = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3), dtype), 1.0, 0
        )["params"]
        params = jax.tree.map(lambda x: x.astype(dtype), params)
        img = jnp.asarray(
            np.random.RandomState(0).rand(1, H, W, 3)).astype(dtype)

        @jax.jit
        def full(p, v):
            _, y = model.apply({"params": p}, v, 1.0, 0)
            return jnp.clip(y / 255.0, 0.0, 1.0)

        out[f"{tag}_b1_436"] = round(timeit(full, params, img), 3)

        # pad-448 A/B: replicate-pad rows inside the program, crop after.
        # NOT output-exact at the 6-px border (the net sees padded context)
        # but the identical FLOP workload at aligned conv grids.
        @jax.jit
        def full_pad(p, v):
            v = replicate_pad(v, (0, 0, 6, 6))
            _, y = model.apply({"params": p}, v, 1.0, 0)
            return jnp.clip(y[:, 6:-6] / 255.0, 0.0, 1.0)

        out[f"{tag}_b1_pad448"] = round(timeit(full_pad, params, img), 3)

        # pad to 512 rows (0.5-aligned everywhere incl. 128-lane folds)
        @jax.jit
        def full_pad512(p, v):
            v = replicate_pad(v, (0, 0, 38, 38))
            _, y = model.apply({"params": p}, v, 1.0, 0)
            return jnp.clip(y[:, 38:-38] / 255.0, 0.0, 1.0)

        out[f"{tag}_b1_pad512"] = round(timeit(full_pad512, params, img), 3)

        print(json.dumps({k: out[k] for k in out if k.startswith(tag)},
                         indent=1), flush=True)

    with open("runs/bisect_b1_r5.json", "w") as f:
        json.dump(out, f, indent=2, sort_keys=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
