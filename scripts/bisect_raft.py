"""Decompose the RAFT pair latency at Sintel resolution: encoders,
correlation-pyramid build, per-GRU-iteration cost (slope of iters=4 vs 20),
and the lookup kernel vs the XLA gather, so the ≤60 ms/pair goal has a
stage budget. Writes a JSON report.

Usage: python scripts/bisect_raft.py [out.json]
"""

import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def timed(fn, *args, iters=6):
    out = fn(*args)
    jax.tree.map(lambda a: np.asarray(a), out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        jax.tree.map(lambda a: np.asarray(a), out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1000.0


def main():
    from vst.flow.raft import RAFT

    H, W = 440, 1024  # InputPadder-padded Sintel shape (multiple of 8)
    rng = np.random.RandomState(0)
    img1 = jnp.asarray(rng.rand(2, H, W, 3).astype(np.float32))
    img2 = jnp.asarray(rng.rand(2, H, W, 3).astype(np.float32))
    report = {"device": str(jax.devices()[0]), "hw": [H, W],
              "batch": 2, "note": "b=2 = fwd+bwd direction batching"}

    for iters in (4, 12, 20):
        raft = RAFT(iters=iters, encoder_dtype=jnp.bfloat16)
        params = raft.init(jax.random.PRNGKey(0), img1, img2)
        fn = jax.jit(lambda p, a, b, m=raft: m.apply(p, a, b)[0])
        ms = timed(fn, params, img1, img2)
        report[f"full_iters{iters}"] = round(ms, 2)
        print(f"full iters={iters}: {ms:.2f} ms")

    slope = (report["full_iters20"] - report["full_iters4"]) / 16.0
    report["per_gru_iter_ms"] = round(slope, 3)
    report["fixed_ms"] = round(report["full_iters4"] - 4 * slope, 2)
    print(f"per-iter {slope:.3f} ms; fixed (encoders+corr+upsample) "
          f"{report['fixed_ms']:.2f} ms")

    # bf16 update block (round-2 measured it SLOWER via per-iter carry
    # casts; re-check now that the mask head is hoisted out of the scan)
    for iters in (4, 20):
        raft = RAFT(iters=iters, encoder_dtype=jnp.bfloat16,
                    update_dtype=jnp.bfloat16)
        params = raft.init(jax.random.PRNGKey(0), img1, img2)
        fn = jax.jit(lambda p, a, b, m=raft: m.apply(p, a, b)[0])
        ms = timed(fn, params, img1, img2)
        report[f"full_bf16upd_iters{iters}"] = round(ms, 2)
        print(f"bf16-update iters={iters}: {ms:.2f} ms")
    report["per_gru_iter_bf16upd_ms"] = round(
        (report["full_bf16upd_iters20"] - report["full_bf16upd_iters4"])
        / 16.0, 3)

    # lookup kernel vs XLA gather at the production query count
    from vst.flow.corr import build_pyramid, lookup_pyramid
    from vst.kernels.pallas_corr import pallas_lookup_pyramid

    f1 = jnp.asarray(rng.rand(2, H // 8, W // 8, 256).astype(np.float32))
    f2 = jnp.asarray(rng.rand(2, H // 8, W // 8, 256).astype(np.float32))
    pyr = jax.jit(build_pyramid)(f1, f2)
    jax.tree.map(lambda a: np.asarray(a), pyr)
    coords = jnp.asarray(
        rng.rand(2, H // 8, W // 8, 2).astype(np.float32) * 16)
    ms_p = timed(jax.jit(lambda p, c: pallas_lookup_pyramid(p, c, 4, 2)),
                 pyr, coords)
    ms_x = timed(jax.jit(lambda p, c: lookup_pyramid(p, c, 4, 2)),
                 pyr, coords)
    report["lookup_pallas_ms"] = round(ms_p, 3)
    report["lookup_xla_ms"] = round(ms_x, 3)
    print(f"lookup pallas {ms_p:.3f} ms vs xla {ms_x:.3f} ms")

    ms_b = timed(jax.jit(build_pyramid), f1, f2)
    report["corr_build_ms"] = round(ms_b, 3)
    print(f"corr build {ms_b:.3f} ms")

    out_path = sys.argv[1] if len(sys.argv) > 1 else "runs/bisect_raft.json"
    with open(out_path, "w") as f:
        json.dump(report, f, indent=2, sort_keys=True)
    print("wrote", out_path)


if __name__ == "__main__":
    main()
