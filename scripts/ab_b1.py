"""A/B the natural-model b1 latency with/without the Pallas trunk conv
in the same process (same chip state, same jitter conditions)."""
import os
import time

import numpy as np
import jax
import jax.numpy as jnp


def measure(fast, dtype, H=436, W=1024, iters=20):
    from vst.models.faststyle import FastStyleNet
    from vst.models.faststyle_fast import fast_stylize

    model = FastStyleNet(n_styles=3)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, H, W, 3), dtype), 1.0, 0)["params"]
    params = jax.tree.map(lambda x: x.astype(dtype), params)

    if fast:
        @jax.jit
        def stylize(p, img):
            _, out = fast_stylize(p, img, 1.0, 0, n_styles=3)
            return jnp.clip(out / 255.0, 0.0, 1.0)
    else:
        @jax.jit
        def stylize(p, img):
            _, out = model.apply({"params": p}, img, 1.0, 0)
            return jnp.clip(out / 255.0, 0.0, 1.0)

    img = jnp.asarray(np.random.RandomState(0).rand(1, H, W, 3)).astype(dtype)
    x = stylize(params, img)
    float(x.sum())
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        x = img
        for _ in range(iters):
            x = stylize(params, x)
        float(x.sum())
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1000.0


def main():
    for dtype, name in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
        for fast in (False, True):
            os.environ["VST_NO_PALLAS_CONV"] = "1"
            t_off = measure(fast, dtype)
            os.environ.pop("VST_NO_PALLAS_CONV")
            t_on = measure(fast, dtype)
            path = "fast" if fast else "natural"
            print(f"{name} {path:7s}: pallas OFF {t_off:.3f} ms | "
                  f"ON {t_on:.3f} ms")


if __name__ == "__main__":
    main()
