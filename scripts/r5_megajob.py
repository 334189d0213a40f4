"""Round-5 consolidated TPU job groups.

The round-4 container SURVIVED into round 5, so runs/ checkpoints exist:
johnson@2000, ruder_r4@2000, stargan1@2000, stargan2_advcon@1500,
mogan@1500. The r4 queue died mid-g4 (sg2 trained, never evaluated) and
never reached g6 (cyclegan family) / the ruder FC2 retry / the OBST
lambda=2000 regen. This script finishes those legs.

One python process per GROUP (relay charges ~10 min client-release
latency per process transition — runs/queue_r4b.log).

Usage: python scripts/r5_megajob.py {sg2_eval,obst2000,ruder_fc2}
"""

import gc
import sys
import time
import traceback

C = "/root/corpus"


def run(name, argv):
    from vst.cli.__main__ import main

    t0 = time.time()
    print(f"=== {name} start", flush=True)
    try:
        main(argv)
        print(f"=== {name} done in {time.time() - t0:.0f}s", flush=True)
        return True
    except Exception:
        traceback.print_exc()
        print(f"=== {name} FAILED after {time.time() - t0:.0f}s", flush=True)
        return False
    finally:
        gc.collect()


def sg2_eval():
    # VERDICT r3 item 1 tail: SG2 AdvCon Sintel golden JSONs (reference:
    # methods/GAN-based/StarGANv2AdvCon sintel_eval outputs). Ckpt is the
    # r4-session-2 1500-step bf16 AdvCon train (runs/stargan2_advcon).
    run("eval_sg2", [
        "eval-sintel", "--family", "stargan2", "--ckpt-dir",
        "runs/stargan2_advcon", "--hw", "436", "1024",
        "--out-dir", "artifacts/stargan2_advcon/eval_sintel"])
    # FC2 metrics at the SAME checkpoint so the committed sg2 suite is
    # internally coherent (the r3 FC2 JSONs are from a 5000-step ckpt the
    # container wipe destroyed).
    run("fc2_sg2", [
        "eval-fc2", "--family", "stargan2", "--ckpt-dir",
        "runs/stargan2_advcon", "--hw", "256", "256", "--batch-size", "8",
        "--data-dir", C, "--lambda-tcl", "100",
        "--out-dir", "artifacts/stargan2_advcon/eval_fc2"])


def obst2000():
    # g3 timed out after the lambda=0 leg in r4; artifacts/obst/2000/* are
    # still the round-3 numbers from the old timer. Regen with the
    # round-4 driver (torch-exact compact LBFGS, net.run-only DT timer,
    # RAFT-MS separate) so the lambda-contrast pair is methodologically
    # uniform.
    run("obst_2000", [
        "eval-obst", "--hw", "436", "1024", "--n-videos", "3",
        "--n-frames", "8", "--lambda-tcl", "2000",
        "--out-dir", "artifacts/obst"])


def ruder_fc2():
    run("fc2_ruder", [
        "eval-fc2", "--family", "faststyle", "--method", "ruder",
        "--ckpt-dir", "runs/ruder_r4", "--pre-style-ckpt", "runs/johnson",
        "--hw", "256", "256", "--batch-size", "8", "--data-dir", C,
        "--out-dir", "artifacts/ruder/eval_fc2"])


if __name__ == "__main__":
    {"sg2_eval": sg2_eval, "obst2000": obst2000,
     "ruder_fc2": ruder_fc2}[sys.argv[1]]()
