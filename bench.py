"""vst benchmark — styled frames/sec/chip on the north-star workload.

Workload (BASELINE.md): Johnson FastStyleNet per-frame stylization at Sintel
resolution 436×1024 (the reference's DT benchmark,
``methods/learning-based/eval_sintel/johnson/DT.json``: 5.87 ms/frame ≈
170 fps on an RTX 2080; north-star ≥60 fps/chip). Prints ONE JSON line.

Timing note: on the tunneled TPU platform ``block_until_ready`` returns
before remote execution finishes, so we time a CHAINED loop (each iteration
consumes the previous output) ended by a scalar fetch — dispatch cannot run
ahead of the device and the final sum forces a full sync.
"""

import json
import time

import numpy as np
import jax
import jax.numpy as jnp

REF_FPS = 1000.0 / 5.87  # reference Johnson DT → 170.4 fps


def _measure(model, dtype, batch, H, W, iters=20, donate=False):
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3), dtype), 1.0, 0
    )["params"]
    params = jax.tree.map(lambda x: x.astype(dtype), params)

    import functools

    # donate=True lets XLA alias the input buffer for the output
    # (chained loop consumes each x exactly once) — removes one
    # full-frame HBM alloc+copy per call
    deco = (functools.partial(jax.jit, donate_argnums=(1,))
            if donate else jax.jit)

    @deco
    def stylize(p, img):
        _, out = model.apply({"params": p}, img, 1.0, 0)
        return jnp.clip(out / 255.0, 0.0, 1.0)

    img = jnp.asarray(np.random.RandomState(0).rand(batch, H, W, 3)).astype(dtype)
    x = stylize(params, jnp.copy(img) if donate else img)
    float(x.sum())  # compile + full sync
    times = []
    for _ in range(3):  # tunneled-chip runs jitter ±10%; keep best AND mean
        x = jnp.copy(img) if donate else img  # donation kills the original
        x.block_until_ready()
        t0 = time.perf_counter()
        for _ in range(iters):
            x = stylize(params, x)
        float(x.sum())  # sync
        times.append((time.perf_counter() - t0) / iters)
    dt, dt_mean = min(times), sum(times) / len(times)

    # chain fused INTO one program (fori_loop): one dispatch, zero host
    # overhead — pure device latency (extra diagnostic, not the headline).
    # Own try: a loop-program compile failure must not discard the already-
    # measured headline numbers for this config.
    dt_fused = float("nan")
    try:
        @jax.jit
        def loop(p, v):
            return jax.lax.fori_loop(0, iters, lambda i, u: stylize(p, u), v)

        x = loop(params, jnp.copy(img) if donate else img)
        float(x.sum())
        dt_fused = float("inf")
        for _ in range(3):
            v = jnp.copy(img) if donate else img
            v.block_until_ready()
            t0 = time.perf_counter()
            x = loop(params, v)
            float(x.sum())
            dt_fused = min(dt_fused, (time.perf_counter() - t0) / iters)
        dt_fused = dt_fused * 1000.0 / batch
    except Exception:  # noqa: BLE001 — diagnostic only
        pass
    return batch / dt, dt * 1000.0 / batch, dt_mean * 1000.0 / batch, dt_fused


def main():
    # Watchdog: if the tunneled backend never initializes (the relay can
    # wedge — see NOTES_ROUND3.md), emit an explicit error record instead
    # of hanging with no JSON line for the driver to parse.
    import os
    import threading

    def _timeout():
        print(json.dumps({
            "metric": "styled_frames_per_sec_per_chip_436x1024_johnson",
            "value": 0.0, "unit": "frames/s/chip", "vs_baseline": 0.0,
            "error": "TPU backend init timed out (relay unavailable)",
        }), flush=True)
        os._exit(3)

    # 480 s: the tunneled relay has been observed to take >300 s to accept
    # a client right after releasing another (runs/queue_r5.log bench_r5a
    # exit=3 while the very next probe passed) — a too-eager watchdog
    # converts a slow-but-healthy relay into a recorded zero
    wd = threading.Timer(480.0, _timeout)
    wd.daemon = True
    wd.start()
    float(jnp.ones((8, 8)).sum())  # backend init + one op
    wd.cancel()

    from vst.models.faststyle import FastStyleNet

    H, W = 436, 1024
    model = FastStyleNet(n_styles=3)

    # The layout-propagated ("fast") and fused-Pallas ("b1") alternate
    # forwards were deleted in round 4 (kill-or-fix, VERDICT r3 item 2).
    # That was a B1-LATENCY verdict: BENCH_r03 measured them losing at
    # batch 1 (f32_b1_fast 17.7 ms vs 8.0; bf16_b1_pallas 7.3 vs 6.6) —
    # the production eval path is b1 — but the fast path WON at batch
    # (bf16_b64_fast 4.45 vs natural bf16_b32 5.48), so the b64/b128
    # natural configs below exist to measure what the natural path's peak
    # throughput actually is post-deletion. RESOLVED round 5: natural
    # bf16_b128 measured 2.44 ms/frame (410 fps) — 1.8× faster than the
    # deleted fast path's best (artifacts/bench_r5_natural.json); the
    # kill regressed nothing. The natural forward routes through the two
    # surviving exact rewrites (s2d 9×9 stem, subpixel up2 decoder —
    # vst/nn/conv.py).
    configs = [
        ("f32_b1", jnp.float32, 1, "natural"),
        ("bf16_b1", jnp.bfloat16, 1, "natural"),
        ("bf16_b8", jnp.bfloat16, 8, "natural"),
        ("bf16_b32", jnp.bfloat16, 32, "natural"),
        ("bf16_b64", jnp.bfloat16, 64, "natural"),
        ("bf16_b128", jnp.bfloat16, 128, "natural"),
        # buffer-donated variants: output aliases the input buffer
        ("f32_b1_dn", jnp.float32, 1, "natural", True),
        ("bf16_b1_dn", jnp.bfloat16, 1, "natural", True),
        ("bf16_b64_dn", jnp.bfloat16, 64, "natural", True),
    ]
    results = {}
    from vst.core.trace import annotate, profile_trace

    failed = {}
    with profile_trace():  # no-op unless VST_PROFILE_DIR is set
        for cfg in configs:
            name, dtype, batch, _path = cfg[:4]
            donate = cfg[4] if len(cfg) > 4 else False
            try:
                with annotate(f"bench/{name}"):
                    fps, ms, ms_mean, ms_fused = _measure(
                        model, dtype, batch, H, W, donate=donate)
                results[name] = (fps, ms, ms_mean, ms_fused)
            except Exception as e:  # noqa: BLE001 — a path that fails to
                # compile (e.g. a Mosaic-rejected Pallas kernel) must not
                # take down the whole benchmark; record and move on
                failed[name] = f"{type(e).__name__}"

    best_name = max(results, key=lambda k: results[k][0])
    best_fps = results[best_name][0]
    # b1 latency = best of the plain and buffer-donated natural paths
    # (identical program modulo input/output aliasing)
    def _pick(*names):
        ok = [n for n in names if n in results]
        return min(ok, key=lambda k: results[k][1])

    f32_pick = _pick("f32_b1", "f32_b1_dn")
    bf16_pick = _pick("bf16_b1", "bf16_b1_dn")

    out = {
        "metric": "styled_frames_per_sec_per_chip_436x1024_johnson",
        "value": round(best_fps, 2),
        "unit": "frames/s/chip",
        "vs_baseline": round(best_fps / REF_FPS, 3),
        "latency_ms_f32_b1": round(results[f32_pick][1], 3),
        "latency_ms_bf16_b1": round(results[bf16_pick][1], 3),
        "latency_ms_f32_b1_mean": round(results[f32_pick][2], 3),
        "latency_ms_bf16_b1_mean": round(results[bf16_pick][2], 3),
        "b1_path": {"f32": f32_pick, "bf16": bf16_pick},
        "methodology": "chained-loop device latency; best-of-3 (mean also reported)",
        "best_config": best_name,
        "device": str(jax.devices()[0]),
        # full per-path breakdown (ms/frame, best-of-3) for diagnosis;
        # _fused = the chain compiled into ONE fori_loop program (pure
        # device latency, no per-call dispatch). Non-finite diagnostics
        # (failed fused compile → NaN) serialize as null — the output
        # line must stay strict RFC-8259 JSON for the driver.
        "paths_ms": {k: round(v[1], 3) for k, v in results.items()},
        "paths_ms_fused": {
            k: (round(v[3], 3) if np.isfinite(v[3]) else None)
            for k, v in results.items()},
    }
    if failed:
        out["failed_paths"] = failed
    print(json.dumps(out))


if __name__ == "__main__":
    main()
