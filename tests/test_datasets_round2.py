"""Round-2 completeness: forward_interpolate, ChairsSDHom/Combined datasets,
procedural corpus + eval-fc2 batch plumbing."""

import os
import sys

import numpy as np
import pytest

from vst.ops.flowtools import forward_interpolate


def test_forward_interpolate_zero_flow():
    flow = np.zeros((12, 16, 2), np.float32)
    out = forward_interpolate(flow)
    assert out.shape == (12, 16, 2)
    np.testing.assert_allclose(out, 0.0)


def test_forward_interpolate_constant_flow():
    # constant translation: the splat lands on a shifted grid; nearest
    # re-interpolation reproduces the constant everywhere
    flow = np.full((16, 20, 2), 2.0, np.float32)
    out = forward_interpolate(flow)
    np.testing.assert_allclose(out, 2.0, atol=1e-6)


def test_forward_interpolate_reference_parity():
    """Against the living reference op (utils/raft/raft/utils/utils.py:26-54),
    channel-first→channel-last adapted."""
    ref_utils = "/root/reference/utils/raft/raft/utils"
    if not os.path.isdir(ref_utils):
        pytest.skip("reference not available")
    torch = pytest.importorskip("torch")
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "_ref_raft_utils", os.path.join(ref_utils, "utils.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    rng = np.random.RandomState(0)
    flow_hw2 = rng.randn(14, 18, 2).astype(np.float32) * 3.0
    ours = forward_interpolate(flow_hw2)
    theirs = mod.forward_interpolate(
        torch.from_numpy(flow_hw2.transpose(2, 0, 1))).numpy()
    np.testing.assert_allclose(ours, theirs.transpose(1, 2, 0), atol=1e-5)


def _write_sdhom_dir(tmp_path, n=4, hw=(64, 96)):
    d = tmp_path / "sdhom"
    d.mkdir()
    rng = np.random.RandomState(1)
    for i in range(n):
        x = rng.rand(hw[0], hw[1], 9).astype(np.float32)
        np.save(str(d / f"{i:05d}.npy"), x)
    return str(d)


def test_chairssdhom_dataset(tmp_path):
    from vst.data.loader import ChairsSDHomDataset

    d = _write_sdhom_dir(tmp_path, n=5, hw=(64, 96))
    ds = ChairsSDHomDataset(d, batch_size=2, crop_hw=(32, 48))
    assert len(ds) == 2  # 5 files → 4 usable
    batches = list(ds.epoch(shuffle=False))
    assert len(batches) == 2
    b = batches[0]
    assert b["imgs"].shape == (2, 2, 32, 48, 3)
    assert b["masks"].shape == (2, 1, 32, 48, 1)
    assert b["flows"].shape == (2, 1, 32, 48, 2)
    # channel order: flow BEFORE mask in the packing (datasets.py:239-269)
    raw = np.load(os.path.join(d, sorted(os.listdir(d))[0]))
    crop = raw[16:48, 24:72]
    np.testing.assert_allclose(b["flows"][0, 0], crop[..., 6:8])
    np.testing.assert_allclose(b["masks"][0, 0], crop[..., 8:9])


def test_combined_dataset(tmp_path):
    from vst.data.loader import (ChairsSDHomDataset, CombinedDataset,
                                 NpyDirDataset)

    d1 = _write_sdhom_dir(tmp_path, n=4, hw=(32, 32))
    a = ChairsSDHomDataset(d1, batch_size=2, crop_hw=(16, 16))
    b = ChairsSDHomDataset(d1, batch_size=4, crop_hw=(16, 16))
    comb = CombinedDataset(a, b)
    assert len(comb) == len(a) + len(b)
    batches = list(comb.epoch(shuffle=False))
    assert len(batches) == len(comb)
    assert batches[0]["imgs"].shape[0] == 2
    assert batches[-1]["imgs"].shape[0] == 4


def test_procedural_corpus_and_fc2_loader(tmp_path):
    from vst.data.datagen import generate_fc2_corpus
    from vst.data.fc2 import DatasetFC2, FC2Loader, train_eval_split

    root = str(tmp_path / "corpus")
    generate_fc2_corpus(root, 6, hw=(32, 32), styler="procedural")
    ds = DatasetFC2(os.path.join(root, "DATAFiles"),
                    os.path.join(root, "styled-files"),
                    os.path.join(root, "styled-files3"),
                    num_dom=4, base_len=None)
    # 6 images × (1 + 3 domains × 3 pairings) entries
    assert len(ds) == 6 * 10
    tr, ev = train_eval_split(len(ds), split=0.9, seed=0)
    loader = FC2Loader(ds, ev, batch_size=2)
    b = next(iter(loader.epoch(shuffle=False)))
    assert b["x_src"].shape == (2, 32, 32, 3)
    assert b["flow"].shape == (2, 32, 32, 2)
    assert b["x_src"].min() >= -1.001 and b["x_src"].max() <= 1.001


def test_procedural_styles_distinct():
    from vst.data.datagen import procedural_stylize

    rng = np.random.RandomState(0)
    img = rng.rand(24, 24, 3).astype(np.float32)
    outs = [procedural_stylize(img, s) for s in range(4)]
    for i in range(4):
        for j in range(i + 1, 4):
            assert np.abs(outs[i] - outs[j]).mean() > 0.02, (i, j)
    # style3 is exactly the reference grayscale postprocess
    assert np.allclose(outs[3][..., 0], outs[3][..., 1])
