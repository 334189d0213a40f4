"""stylize-video: the offline batch-throughput path must write every
frame and produce the same pixels as per-frame stylization (instance
norm and convs are per-sample, so batching cannot change values)."""

import json
import os

import numpy as np


def test_stylize_video_batch_matches_per_frame(tmp_path, capsys):
    from vst.cli.__main__ import main

    out_b = tmp_path / "b4"
    out_s = tmp_path / "b1"
    for out, bs in ((out_b, "4"), (out_s, "1")):
        main(["stylize-video", "--platform", "cpu", "--hw", "48", "64",
              "--batch-size", bs, "--n-frames", "6", "--seed", "3",
              "--out-dir", str(out)])
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["frames"] == 6 and rec["frames_per_sec"] > 0

    frames_b = sorted(f for f in os.listdir(out_b) if f.endswith(".png"))
    assert len(frames_b) == 6  # tail chunk (6 = 4 + 2) padded, not dropped
    import imageio.v2 as imageio

    for f in frames_b:
        a = imageio.imread(out_b / f)
        b = imageio.imread(out_s / f)
        # identical modulo 8-bit rounding of float batch-vs-single noise
        assert np.abs(a.astype(int) - b.astype(int)).max() <= 1
    assert (out_b / "styled.gif").exists() or (out_b / "styled.mp4").exists()
