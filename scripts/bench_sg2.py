"""StarGAN-v2 training-throughput benchmark — writes a regenerable JSON
artifact (VERDICT r2 weak #3 / next #6: the 13.1 img/s f32 number lived in
NOTES; the bf16 policy was the unbuilt lever toward 4x the reference's
4.0 img/s, StarGANv2Adv/losses.txt first/last lines).

Times the full AdvCon iteration (2x D step, 2x G step, F/E steps, EMA,
lambda_tcl temporal term) on synthetic FC2 batches at 256px, steady state,
chained by donating the state through the loop; scalar fetch syncs.

Usage: python scripts/bench_sg2.py <out_json> [batch] [steps] [dtype...]
"""
import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from vst.data.fc2 import synthetic_fc2_batches
from vst.train.stargan2 import StarGAN2Config, StarGAN2Trainer


def measure(compute_dtype, batch_size, steps):
    cfg = StarGAN2Config(img_size=256, num_domains=4,
                         compute_dtype=compute_dtype, lambda_tcl=100.0)
    trainer = StarGAN2Trainer(cfg, seed=0)
    state = trainer.init_state(0)
    b = next(iter(synthetic_fc2_batches(1, batch_size, hw=(256, 256),
                                        num_dom=4, seed=0)))
    batch = {
        "x_real": jnp.asarray(b["x_src"]), "x_real2": jnp.asarray(b["x2_src"]),
        "x_ref": jnp.asarray(b["x_ref"]), "y_org": jnp.asarray(b["y_src"]),
        "y_trg": jnp.asarray(b["y_ref"]), "mask": jnp.asarray(b["mask"]),
        "flow": jnp.asarray(b["flow"]),
    }
    rng = jax.random.PRNGKey(0)
    state, m = trainer.train_iteration(state, batch, rng)  # compile
    float(m["G/latent_adv"])
    t0 = time.perf_counter()
    for i in range(steps):
        rng, sub = jax.random.split(rng)
        state, m = trainer.train_iteration(state, batch, sub)
    float(m["G/latent_adv"])  # sync
    dt = (time.perf_counter() - t0) / steps
    return dt, float(m["G/latent_adv"])


def main():
    out_json = sys.argv[1]
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    steps = int(sys.argv[3]) if len(sys.argv) > 3 else 30
    results = {
        "workload": "StarGAN-v2 AdvCon full iteration, 256px, synthetic FC2",
        "batch_size": batch,
        "steps_timed": steps,
        "reference_img_per_s": 4.0,
        "reference_source": "StarGANv2Adv/losses.txt 100k iters bs16 in ~4d16h",
        "device": str(jax.devices()[0]),
    }
    for dtype_name in (sys.argv[4:] or ["float32", "bfloat16"]):
        dt, adv = measure(dtype_name, batch, steps)
        results[dtype_name] = {
            "s_per_iter": round(dt, 4),
            "img_per_s": round(batch / dt, 2),
            "vs_reference": round(batch / dt / 4.0, 2),
            "final_latent_adv": adv,
        }
        print(f"{dtype_name}: {dt:.3f} s/iter = {batch / dt:.1f} img/s")
    with open(out_json, "w") as f:
        json.dump(results, f, indent=2, sort_keys=True)
    print("wrote", out_json)


if __name__ == "__main__":
    main()
