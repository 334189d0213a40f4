"""Round-5 session-2 consolidated TPU job groups.

FRESH container (third wipe): /root/corpus and runs/ checkpoints are
gone, so scripts/r5_megajob.py's assumption (r4 ckpts survive) is dead.
These groups retrain what their evals need, in the order that completes
"vst's committed eval set ⊇ the reference's own committed tree"
(VERDICT r3 item 1 tail; COVERAGE round-4 row 1):

  g_ruder  johnson train (ruder's bootstrap) -> ruder train -> ruder FC2
           (reference: methods/learning-based/eval_fc2/ruder — the last
           missing FC2 pair; ruder's Sintel JSONs are already committed)
  g_cg     CycleGAN-family trains + Sintel evals (sid1, con, congan —
           the last missing Sintel sets)
  g_obst   OBST lambda=2000 regen with the round-4 driver so the
           committed lambda-contrast pair is methodologically uniform
           (artifacts/obst/2000/* are still round-3 timer numbers)

One python process per GROUP: the tunneled relay charges ~10 min of
client-release latency per process transition (runs/queue_r4b.log).

Usage: python scripts/r5b_megajob.py {g_ruder,g_cg,g_obst}
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


def g_ruder():
    ok = run("train_johnson", [
        "train-faststyle", "--method", "johnson", "--n-styles", "3",
        "--data-dir", f"{C}/DATAFiles", "--device-cache", "2000",
        "--steps", "2000", "--batch-size", "16", "--hw", "256", "256",
        "--out-dir", "runs/johnson", "--log-every", "50"])
    if not ok:
        return
    ok = run("train_ruder", [
        "train-faststyle", "--method", "ruder", "--n-styles", "3",
        "--data-dir", f"{C}/DATAFiles", "--device-cache", "2000",
        "--steps", "2000", "--batch-size", "8", "--hw", "256", "256",
        "--pre-style-ckpt", "runs/johnson",
        "--out-dir", "runs/ruder_r4", "--log-every", "50"])
    if ok:
        run("fc2_ruder", [
            "eval-fc2", "--family", "faststyle", "--method", "ruder",
            "--ckpt-dir", "runs/ruder_r4", "--pre-style-ckpt", "runs/johnson",
            "--hw", "256", "256", "--batch-size", "8", "--data-dir", C,
            "--out-dir", "artifacts/ruder/eval_fc2"])


def g_cg():
    ok1 = run("train_cyclegan", [
        "train-cyclegan", "--variant", "cyclegan", "--sid", "1",
        "--data-dir", C, "--device-cache", "1000", "--steps", "1500",
        "--batch-size", "4", "--hw", "256", "256",
        "--out-dir", "runs/cyclegan_sid1", "--log-every", "50"])
    if ok1:
        run("eval_cg", [
            "eval-sintel", "--family", "cyclegan", "--ckpt-dir",
            "cyclegan:runs/cyclegan_sid1", "--hw", "436", "1024",
            "--out-dir", "artifacts/cyclegan_sid1/eval_sintel"])
    ok2 = run("train_cyclegan_con", [
        "train-cyclegan", "--variant", "cyclegan_con", "--sid", "1",
        "--data-dir", C, "--device-cache", "1000", "--steps", "1500",
        "--batch-size", "4", "--hw", "256", "256",
        "--out-dir", "runs/cyclegan_con", "--log-every", "50"])
    if ok2:
        run("eval_cg_con", [
            "eval-sintel", "--family", "cyclegan", "--ckpt-dir",
            "cyclegan_con:runs/cyclegan_con", "--hw", "436", "1024",
            "--out-dir", "artifacts/cyclegan_con/eval_sintel"])
    ok3 = run("train_congan", [
        "train-cyclegan", "--variant", "congan", "--sid", "1",
        "--data-dir", C, "--device-cache", "1000", "--steps", "1500",
        "--batch-size", "2", "--hw", "256", "256", "--raft-iters", "8",
        "--out-dir", "runs/congan", "--log-every", "50"])
    if ok3:
        run("eval_congan", [
            "eval-sintel", "--family", "cyclegan", "--ckpt-dir",
            "congan:runs/congan", "--hw", "436", "1024",
            "--out-dir", "artifacts/congan/eval_sintel"])


def g_obst():
    run("obst_2000", [
        "eval-obst", "--hw", "436", "1024", "--n-videos", "3",
        "--n-frames", "8", "--lambda-tcl", "2000",
        "--out-dir", "artifacts/obst"])


if __name__ == "__main__":
    {"g_ruder": g_ruder, "g_cg": g_cg, "g_obst": g_obst}[sys.argv[1]]()
