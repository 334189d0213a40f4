"""Decompose the RAFT pair latency at Sintel resolution with CHAINED
device timing: every stage is wrapped in a jitted fori_loop whose carry
feeds the stage output back into its input (data dependence defeats
loop-invariant hoisting), and only a scalar leaves the device — the
axon tunnel makes unchained dispatch windows and full-output fetches
meaningless (the previous revision's "corr_build 7348 ms" was a 396 MB
volume fetch, not device time; the chained bench measured the same full
pair at 172 ms).

Stages: encoders (fnet+cnet), corr-pyramid build, full-pair slope over
GRU iters (4/12/20), lookup kernel (Pallas vs XLA gather, per full
4-level set), update-block-only iteration. Writes a JSON report.

Usage: python scripts/bisect_raft.py [out.json]
"""

import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def chain_ms(fn, x, K=20, reps=3):
    """Best-of-`reps` per-call ms of `fn` chained K times inside one
    program. `fn` may return any pytree; a scalar probe of the output is
    folded back into the (shape-preserved) carry."""

    def step(v):
        out = fn(v)
        probe = sum(jnp.mean(o).astype(jnp.float32)
                    for o in jax.tree.leaves(out))
        return v * (1.0 + 0.0 * probe.astype(v.dtype))

    loop = jax.jit(lambda v: jnp.mean(
        jax.lax.fori_loop(0, K, lambda i, v: step(v), v)))
    float(loop(x))  # compile + warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(loop(x))
        best = min(best, (time.perf_counter() - t0) / K)
    return best * 1000.0


def main():
    from vst.flow.raft import RAFT

    H, W = 440, 1024  # InputPadder-padded Sintel shape (multiple of 8)
    if len(sys.argv) > 2 and sys.argv[2] == "smoke":  # CPU plumbing check
        H, W = 64, 96
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(2, H, W, 3).astype(np.float32) * 255.0)
    report = {"device": str(jax.devices()[0]), "hw": [H, W], "batch": 2,
              "note": "b=2 = fwd+bwd direction batching; chained fori_loop "
                      "timing, scalar fetch"}

    # -- full pair at 4/12/20 GRU iters (both dtype policies) -------------
    def full_pair(iters, update_dtype=None):
        raft = RAFT(iters=iters, encoder_dtype=jnp.bfloat16,
                    update_dtype=update_dtype, pallas_lookup=True)
        params = raft.init(jax.random.PRNGKey(0), img, img)

        def fn(im):
            _, up = raft.apply(params, im, im[:, :, ::-1, :])
            return up

        return fn

    for iters in (4, 12, 20):
        ms = chain_ms(full_pair(iters), img, K=6)
        report[f"full_iters{iters}"] = round(ms, 2)
        print(f"full iters={iters}: {ms:.2f} ms", flush=True)
    slope = (report["full_iters20"] - report["full_iters4"]) / 16.0
    report["per_gru_iter_ms"] = round(slope, 3)
    report["fixed_ms"] = round(report["full_iters4"] - 4 * slope, 2)
    print(f"per-iter {slope:.3f} ms; fixed {report['fixed_ms']:.2f} ms",
          flush=True)

    for iters in (4, 20):
        ms = chain_ms(full_pair(iters, update_dtype=jnp.bfloat16), img, K=6)
        report[f"full_bf16upd_iters{iters}"] = round(ms, 2)
        print(f"bf16-update iters={iters}: {ms:.2f} ms", flush=True)
    report["per_gru_iter_bf16upd_ms"] = round(
        (report["full_bf16upd_iters20"] - report["full_bf16upd_iters4"])
        / 16.0, 3)

    # -- encoders only -----------------------------------------------------
    from vst.flow.raft import BasicEncoder

    fnet = BasicEncoder(256, "instance", dtype=jnp.bfloat16)
    fp = fnet.init(jax.random.PRNGKey(0), img)
    ms = chain_ms(lambda im: fnet.apply(fp, im), img, K=20)
    report["fnet_pair_ms"] = round(ms, 3)  # fnet on the 2-image batch
    print(f"fnet(b2) {ms:.3f} ms", flush=True)

    # -- corr pyramid build -------------------------------------------------
    from vst.flow.corr import build_pyramid, lookup_pyramid
    from vst.kernels.pallas_corr import pallas_lookup_pyramid

    h8, w8 = H // 8, W // 8
    f1 = jnp.asarray(rng.rand(2, h8, w8, 256).astype(np.float32))

    def build_fn(f):
        return build_pyramid(f, f[:, :, ::-1, :])

    ms = chain_ms(build_fn, f1, K=10)
    report["corr_build_ms"] = round(ms, 3)
    print(f"corr build {ms:.3f} ms", flush=True)

    # -- lookup: full 4-level set at the production query count ------------
    pyr = jax.jit(build_pyramid)(f1, f1[:, :, ::-1, :])
    pyr = jax.tree.map(jax.device_put, pyr)
    coords = jnp.asarray(
        rng.rand(2, h8, w8, 2).astype(np.float32) * 16)

    def mk_lookup(impl):
        def fn(c):
            out = impl(pyr, c, 4, 2)  # (2, h8, w8, 324)
            return c + 0.0 * out[..., :2]
        return fn

    for name, impl in (("lookup_pallas_ms", pallas_lookup_pyramid),
                       ("lookup_xla_ms", lookup_pyramid)):
        ms = chain_ms(mk_lookup(impl), coords, K=20)
        report[name] = round(ms, 3)
        print(f"{name} {ms:.3f} ms", flush=True)

    # -- update block only (motion encoder + GRU + flow head), no lookup ---
    from vst.flow.raft import BasicUpdateBlock

    blk = BasicUpdateBlock(128)
    net = jnp.asarray(rng.rand(2, h8, w8, 128).astype(np.float32))
    inp = jnp.asarray(rng.rand(2, h8, w8, 128).astype(np.float32))
    corr_feat = jnp.asarray(rng.rand(2, h8, w8, 324).astype(np.float32))
    flow = jnp.asarray(rng.rand(2, h8, w8, 2).astype(np.float32))
    bp = blk.init(jax.random.PRNGKey(0), net, inp, corr_feat, flow)

    def upd_fn(n):
        # tie every input to the carry (0·mean(n) — value-neutral, but XLA
        # cannot prove it, so nothing is loop-invariant-hoisted or
        # constant-folded out of the chain; the smoke run showed the whole
        # motion encoder folding away otherwise)
        tie = 0.0 * jnp.mean(n)
        n2, d = blk.apply(bp, n, inp + tie, corr_feat + tie, flow + tie)
        return n2 + 0.0 * jnp.mean(d).astype(n2.dtype)

    ms = chain_ms(upd_fn, net, K=20)
    report["update_block_ms"] = round(ms, 3)
    print(f"update block {ms:.3f} ms", flush=True)

    out_path = sys.argv[1] if len(sys.argv) > 1 else "runs/bisect_raft.json"
    with open(out_path, "w") as f:
        json.dump(report, f, indent=2, sort_keys=True)
    print("wrote", out_path)


if __name__ == "__main__":
    main()
