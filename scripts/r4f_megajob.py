"""Round-4 session-2 consolidated TPU job groups.

Fresh container again: /root/corpus and runs/ checkpoints are gone, so
the still-missing golden-JSON evals (VERDICT r3 item 1) retrain first.
Groups are ordered so the two artifacts that complete "vst's committed
eval set ⊇ the reference's own committed tree" land first:

  g1  ruder Sintel + FC2   (reference: methods/learning-based/eval_sintel/ruder,
                            eval_fc2/ruder)
  g2  StarGAN v1 Sintel+FC2 (reference: methods/GAN-based/StarGAN/sintel_eval)
  g3  OBST lambda-contrast regen with the round-4 driver (torch-exact
      [60,60,40] compact LBFGS, net.run-only DT timer, RAFT-MS separate)
  g4  SG2 AdvCon Sintel eval (432-crop fix, commit 5c6ca69)
  g5  MoGAN full union E+M logging + Sintel eval (VERDICT item 7)
  g6  CycleGAN-family Sintel evals

One python process per GROUP: the tunneled relay charges ~10 min of
client-release latency per process transition (runs/queue_r4b.log, r4
session 1), and in-process sequencing shares the 436x1024 RAFT compile.

Usage: python scripts/r4f_megajob.py {g1,g2,g3,g4,g5,g6}
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


def g1():
    # Johnson is Ruder's bootstrap (its own evals are already committed
    # from wave 1; the ckpt just needs to exist for --pre-style-ckpt).
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
        import shutil

        shutil.copy("runs/ruder_r4/losses.txt", "artifacts/ruder/losses.txt")
        run("eval_ruder", [
            "eval-sintel", "--method", "ruder", "--n-styles", "3",
            "--ckpt-dir", "runs/ruder_r4", "--pre-style-ckpt", "runs/johnson",
            "--hw", "436", "1024", "--out-dir", "artifacts/ruder/eval_sintel"])
        run("fc2_ruder", [
            "eval-fc2", "--family", "faststyle", "--method", "ruder",
            "--ckpt-dir", "runs/ruder_r4", "--pre-style-ckpt", "runs/johnson",
            "--hw", "256", "256", "--batch-size", "8", "--data-dir", C,
            "--out-dir", "artifacts/ruder/eval_fc2"])


def g2():
    # cache-native 256 (the hw-128 recipe crashes the D cls head on the
    # 256-sq device-cache samples — commit 6792715)
    ok = run("train_stargan1", [
        "train-stargan", "--num-domains", "4", "--data-dir", C,
        "--device-cache", "1000", "--steps", "2000", "--batch-size", "8",
        "--hw", "256", "256", "--out-dir", "runs/stargan1",
        "--log-every", "50"])
    if ok:
        import shutil

        shutil.copy("runs/stargan1/losses.txt", "artifacts/stargan1/losses.txt")
        run("eval_sg1", [
            "eval-sintel", "--family", "stargan", "--ckpt-dir",
            "runs/stargan1", "--hw", "436", "1024",
            "--out-dir", "artifacts/stargan1/eval_sintel"])
        run("fc2_sg1", [
            "eval-fc2", "--family", "stargan", "--ckpt-dir", "runs/stargan1",
            "--hw", "256", "256", "--batch-size", "8", "--data-dir", C,
            "--out-dir", "artifacts/stargan1/eval_fc2"])


def g3():
    run("obst_r4", [
        "eval-obst", "--hw", "436", "1024", "--n-videos", "3",
        "--n-frames", "8", "--lambda-tcl", "0", "2000",
        "--out-dir", "artifacts/obst"])


def g4():
    ok = run("train_sg2", [
        "train-stargan2", "--num-domains", "4", "--data-dir", C,
        "--device-cache", "1000", "--steps", "1500", "--batch-size", "8",
        "--hw", "256", "256", "--lambda-tcl", "100",
        "--compute-dtype", "bfloat16",
        "--out-dir", "runs/stargan2_advcon", "--log-every", "50"])
    if ok:
        run("eval_sg2", [
            "eval-sintel", "--family", "stargan2", "--ckpt-dir",
            "runs/stargan2_advcon", "--hw", "436", "1024",
            "--out-dir", "artifacts/stargan2_advcon/eval_sintel"])


def g5():
    ok = run("train_mogan", [
        "train-cyclegan", "--variant", "mogan", "--sid", "1",
        "--data-dir", C, "--device-cache", "1000", "--steps", "1500",
        "--batch-size", "2", "--hw", "256", "256", "--raft-iters", "8",
        "--out-dir", "runs/mogan", "--log-every", "50"])
    if ok:
        import shutil

        # VERDICT r3 item 7: the committed MoGAN log must carry the full
        # union E+M term set (adv/cycle/MC/MT/AM).
        shutil.copy("runs/mogan/losses.txt", "artifacts/mogan/losses.txt")
        run("eval_mogan", [
            "eval-sintel", "--family", "cyclegan", "--ckpt-dir",
            "mogan:runs/mogan", "--hw", "436", "1024",
            "--out-dir", "artifacts/mogan/eval_sintel"])


def g6():
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


if __name__ == "__main__":
    {"g1": g1, "g2": g2, "g3": g3, "g4": g4, "g5": g5, "g6": g6}[sys.argv[1]]()
