"""Round-4 perf probes — ONE process: b1 stage bisect, RAFT bisect, OBST
frame timing with the compact-LBFGS [60,60,40] torch-exact driver (f32 and
bf16 closures), then bench.py's measurement core. Writes runs/perfprobe_r4.json.

Run AFTER the artifact mega-jobs (scripts/queue_r4d.sh chains it)."""

import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

OUT = sys.argv[1] if len(sys.argv) > 1 else "runs/perfprobe_r4.json"
report = {}


def save():
    with open(OUT, "w") as f:
        json.dump(report, f, indent=2, sort_keys=True)


def chain_ms(fn, x0, K=10, reps=3):
    def g(x):
        return x * (1.0 + 0.0 * jnp.mean(fn(x)).astype(x.dtype))

    loop = jax.jit(lambda v: jax.lax.fori_loop(0, K, lambda i, u: g(u), v))
    float(jnp.sum(loop(x0).astype(jnp.float32)))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(jnp.sum(loop(x0).astype(jnp.float32)))
        best = min(best, (time.perf_counter() - t0) / K)
    return best * 1000.0


print("== b1 stage bisect ==", flush=True)
try:
    from vst.models.faststyle import FastStyleNet, ResidualBlock, _Norm
    from vst.nn.conv import ConvLayer, UpsampleConvLayer, ConvTanh

    H, W = 436, 1024
    model = FastStyleNet(n_styles=3)
    p32 = model.init(jax.random.PRNGKey(0),
                     jnp.zeros((1, H, W, 3), jnp.float32), 1.0, 0)["params"]
    rng = np.random.RandomState(0)
    for dname, dtype in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
        P = jax.tree.map(lambda v: v.astype(dtype), p32)

        def inp(h, w, c):
            return jnp.asarray(rng.rand(1, h, w, c)).astype(dtype)

        def norm_relu(i):
            return lambda x: jax.nn.relu(
                _Norm(3).apply({"params": P[f"_Norm_{i}"]}, x, 0))

        def res5(x):
            for j in range(5):
                x = ResidualBlock(128).apply(
                    {"params": P[f"ResidualBlock_{j}"]}, x, 1.0)
            return x

        stages = {
            "stem1": (lambda x: norm_relu(0)(ConvLayer(32, 9, stride=1).apply(
                {"params": P["ConvLayer_0"]}, x)), inp(H, W, 3)),
            "stem2": (lambda x: norm_relu(1)(ConvLayer(64, 3, stride=2).apply(
                {"params": P["ConvLayer_1"]}, x)), inp(H, W, 32)),
            "stem3": (lambda x: norm_relu(2)(ConvLayer(128, 3, stride=2).apply(
                {"params": P["ConvLayer_2"]}, x)), inp(H // 2, W // 2, 64)),
            "res5": (res5, inp(H // 4, W // 4, 128)),
            "dec1": (lambda x: norm_relu(3)(
                UpsampleConvLayer(64, 3, stride=1, upsample=2).apply(
                    {"params": P["UpsampleConvLayer_0"]}, x)),
                inp(H // 4, W // 4, 128)),
            "dec2": (lambda x: norm_relu(4)(
                UpsampleConvLayer(32, 3, stride=1, upsample=2).apply(
                    {"params": P["UpsampleConvLayer_1"]}, x)),
                inp(H // 2, W // 2, 64)),
            "head": (lambda x: ConvTanh(3, 9).apply(
                {"params": P["ConvTanh_0"]}, x), inp(H, W, 32)),
        }
        d = {}
        for nm, (fn, x0) in stages.items():
            d[nm] = round(chain_ms(fn, x0), 3)
            print(f"  {dname} {nm}: {d[nm]} ms", flush=True)
        d["SUM"] = round(sum(d.values()), 3)
        report[f"b1_stages_{dname}"] = d
        save()
except Exception as e:  # noqa: BLE001
    report["b1_stages_error"] = repr(e)
    save()

print("== raft batch slope ==", flush=True)
try:
    from vst.flow.raft import RAFT

    Hr, Wr = 440, 1024
    rngr = np.random.RandomState(1)
    raft = RAFT(iters=20, encoder_dtype=jnp.bfloat16, pallas_lookup=True)
    img1 = jnp.asarray(rngr.rand(1, Hr, Wr, 3).astype(np.float32) * 255)
    pr = raft.init(jax.random.PRNGKey(0), img1, img1)
    slope = {}
    for b in (2, 4, 8):
        x = jnp.asarray(rngr.rand(b, Hr, Wr, 3).astype(np.float32) * 255)

        def pair(v):
            _, up = raft.apply(pr, v, v[:, :, ::-1, :])
            return v * (1.0 + 0.0 * jnp.mean(up).astype(v.dtype))

        ms = chain_ms(pair, x, K=4)
        # b directions = b/2 flow pairs per program
        slope[f"b{b}"] = {"ms_total": round(ms, 1),
                          "ms_per_pair": round(ms / (b / 2), 1)}
        print(f"  raft b{b}: {ms:.1f} ms total, "
              f"{ms / (b / 2):.1f} ms/pair", flush=True)
    report["raft_batch_slope"] = slope
    save()
except Exception as e:  # noqa: BLE001
    report["raft_batch_slope_error"] = repr(e)
    save()

print("== raft bisect ==", flush=True)
try:
    sys.argv = ["bisect_raft", "runs/bisect_raft_r4.json"]
    import importlib

    br = importlib.import_module("scripts.bisect_raft") if False else None
    # run as a subprocess-free exec to reuse this client session
    src = open("scripts/bisect_raft.py").read()
    g = {"__name__": "__main__"}
    exec(compile(src, "scripts/bisect_raft.py", "exec"), g)
    report["bisect_raft"] = json.load(open("runs/bisect_raft_r4.json"))
    save()
except Exception as e:  # noqa: BLE001
    report["bisect_raft_error"] = repr(e)
    save()

print("== obst frame timing ==", flush=True)
try:
    from vst.models.gatys import OBST, PYR_SINTEL
    from vst.perceptual.vgg import obst_prep

    rng = np.random.RandomState(0)
    frame = jnp.asarray(rng.rand(1, 436, 1024, 3).astype(np.float32))
    img = obst_prep(frame)
    mask = jnp.ones(img.shape[:3] + (1,))
    style = rng.rand(256, 256, 3).astype(np.float32)
    for dname, dtype in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
        obst = OBST(compute_dtype=dtype)  # [50,40,30] → [60,60,40] evals
        obst.set_style(style, PYR_SINTEL)
        t0 = time.time()
        out = obst.run(img, img, mask, PYR_SINTEL, weight_tcl=2000.0)
        float(out.sum())
        compile_and_first = time.time() - t0
        times = []
        for _ in range(2):
            t0 = time.time()
            out = obst.run(img, img, mask, PYR_SINTEL, weight_tcl=2000.0)
            float(out.sum())
            times.append(time.time() - t0)
        report[f"obst_frame_s_{dname}"] = {
            "first_incl_compile": round(compile_and_first, 2),
            "steady": round(min(times), 3),
            "evals": [60, 60, 40], "impl": "compact",
        }
        print(f"  obst {dname}: steady {min(times):.3f}s "
              f"(first {compile_and_first:.1f}s)", flush=True)
        save()
except Exception as e:  # noqa: BLE001
    report["obst_error"] = repr(e)
    save()

print("done ->", OUT, flush=True)
