"""Round-4 consolidated TPU job groups.

One python process per GROUP: the tunneled relay charges ~10 min of
client-release + probe-retry latency per process transition (measured in
runs/queue_r4b.log), and separate processes also each pay the 436×1024
RAFT/program compiles. Running a group's train+eval steps sequentially
in-process pays ONE client session and ONE compile per distinct program.

Usage: python scripts/r4_megajob.py {faststyle,gan1,gan2}
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


def train_faststyle(method, out, steps=2000, bs=16, extra=()):
    return run(f"train_{method}", [
        "train-faststyle", "--method", method, "--n-styles", "3",
        "--data-dir", f"{C}/DATAFiles", "--device-cache", "2000",
        "--steps", str(steps), "--batch-size", str(bs),
        "--hw", "256", "256", "--out-dir", out, "--log-every", "50",
        *extra])


def eval_sintel_faststyle(method, ckpt, out):
    return run(f"eval_{method}", [
        "eval-sintel", "--method", method, "--n-styles", "3",
        "--ckpt-dir", ckpt, "--hw", "436", "1024", "--out-dir", out])


def group_faststyle():
    ok = train_faststyle("dumoulin", "runs/dumoulin")
    if ok:
        eval_sintel_faststyle("dumoulin", "runs/dumoulin",
                              "artifacts/dumoulin/eval_sintel")
    ok = train_faststyle("huang", "runs/huang", bs=8)
    if ok:
        eval_sintel_faststyle("huang", "runs/huang",
                              "artifacts/huang/eval_sintel")
    ok = train_faststyle("reconet", "runs/reconet")
    if ok:
        eval_sintel_faststyle("reconet", "runs/reconet",
                              "artifacts/reconet/eval_sintel")
    ok = train_faststyle("ruder", "runs/ruder_r4", bs=8,
                         extra=["--pre-style-ckpt", "runs/johnson"])
    if ok:
        eval_sintel_faststyle("ruder", "runs/ruder_r4",
                              "artifacts/ruder/eval_sintel")
        run("fc2_ruder", [
            "eval-fc2", "--family", "faststyle", "--method", "ruder",
            "--ckpt-dir", "runs/ruder_r4", "--hw", "256", "256",
            "--batch-size", "8", "--data-dir", C,
            "--out-dir", "artifacts/ruder/eval_fc2"])


def group_gan1():
    ok = run("train_stargan1", [
        "train-stargan", "--num-domains", "4", "--data-dir", C,
        "--device-cache", "1000", "--steps", "2000", "--batch-size", "16",
        "--hw", "128", "128", "--out-dir", "runs/stargan1",
        "--log-every", "50"])
    if ok:
        run("eval_sg1", [
            "eval-sintel", "--family", "stargan", "--ckpt-dir",
            "runs/stargan1", "--hw", "436", "1024",
            "--out-dir", "artifacts/stargan1/eval_sintel"])
        run("fc2_sg1", [
            "eval-fc2", "--family", "stargan", "--ckpt-dir", "runs/stargan1",
            "--hw", "256", "256", "--batch-size", "8", "--data-dir", C,
            "--out-dir", "artifacts/stargan1/eval_fc2"])
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


def group_gan2():
    ok1 = run("train_cyclegan", [
        "train-cyclegan", "--variant", "cyclegan", "--sid", "1",
        "--data-dir", C, "--device-cache", "1000", "--steps", "1500",
        "--batch-size", "4", "--hw", "256", "256",
        "--out-dir", "runs/cyclegan_sid1", "--log-every", "50"])
    ok2 = run("train_cyclegan_con", [
        "train-cyclegan", "--variant", "cyclegan_con", "--sid", "1",
        "--data-dir", C, "--device-cache", "1000", "--steps", "1500",
        "--batch-size", "4", "--hw", "256", "256",
        "--out-dir", "runs/cyclegan_con", "--log-every", "50"])
    if ok1 and ok2:
        run("eval_cg", [
            "eval-sintel", "--family", "cyclegan", "--ckpt-dir",
            "cyclegan:runs/cyclegan_sid1,cyclegan_con:runs/cyclegan_con",
            "--hw", "436", "1024",
            "--out-dir", "artifacts/cyclegan_sid1/eval_sintel"])
    ok = run("train_congan", [
        "train-cyclegan", "--variant", "congan", "--sid", "1",
        "--data-dir", C, "--device-cache", "1000", "--steps", "1500",
        "--batch-size", "2", "--hw", "256", "256", "--raft-iters", "8",
        "--out-dir", "runs/congan", "--log-every", "50"])
    if ok:
        run("eval_congan", [
            "eval-sintel", "--family", "cyclegan", "--ckpt-dir",
            "congan:runs/congan", "--hw", "436", "1024",
            "--out-dir", "artifacts/congan/eval_sintel"])
    ok = run("train_mogan", [
        "train-cyclegan", "--variant", "mogan", "--sid", "1",
        "--data-dir", C, "--device-cache", "1000", "--steps", "1500",
        "--batch-size", "2", "--hw", "256", "256", "--raft-iters", "8",
        "--out-dir", "runs/mogan", "--log-every", "50"])
    if ok:
        import shutil

        # VERDICT r3 item 7: the committed MoGAN log must carry the full
        # union E+M term set
        shutil.copy("runs/mogan/losses.txt", "artifacts/mogan/losses.txt")
        run("eval_mogan", [
            "eval-sintel", "--family", "cyclegan", "--ckpt-dir",
            "mogan:runs/mogan", "--hw", "436", "1024",
            "--out-dir", "artifacts/mogan/eval_sintel"])
    run("bench_raft", [
        "bench-raft", "--hw", "436", "1024", "--out-dir", "artifacts/raft"])


if __name__ == "__main__":
    {"faststyle": group_faststyle,
     "gan1": group_gan1,
     "gan2": group_gan2}[sys.argv[1]]()
