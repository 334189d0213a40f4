"""Flow-training surface: RAFT train mode + sequence loss + augmentor."""

import numpy as np
import jax
import jax.numpy as jnp

from vst.flow.raft import RAFT
from vst.flow.datasets import FlowAugmentor, flow_sequence_loss
from vst.flow.viz import flow_to_image
import pytest


@pytest.mark.slow
def test_raft_train_mode_and_sequence_loss_grads():
    raft = RAFT(small=False, iters=3, train_mode=True)
    rng = np.random.RandomState(0)
    i1 = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32) * 255)
    i2 = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32) * 255)
    params = raft.init(jax.random.PRNGKey(0), i1, i2)["params"]

    gt = jnp.zeros((1, 64, 64, 2))
    valid = jnp.ones((1, 64, 64))

    def loss_fn(p):
        _, preds = raft.apply({"params": p}, i1, i2)
        return flow_sequence_loss([preds[i] for i in range(preds.shape[0])],
                                  gt, valid)

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    gnorm = sum(float(jnp.abs(g).sum()) for g in jax.tree_util.tree_leaves(grads))
    assert gnorm > 0  # gradients reach the update block through the scan


def test_augmentor_flow_consistency():
    """h-flip must negate u; scaling must scale the flow."""
    aug = FlowAugmentor((32, 32), min_scale=0.0, max_scale=0.0, do_flip=False,
                        seed=1)
    i1 = np.random.RandomState(1).rand(64, 64, 3).astype(np.float32) * 255
    fl = np.ones((64, 64, 2), np.float32)
    _, _, af = aug(i1, i1.copy(), fl)
    np.testing.assert_allclose(af, 1.0, rtol=1e-5)


def test_flow_viz_output():
    img = flow_to_image(np.zeros((8, 8, 2), np.float32))
    assert img.shape == (8, 8, 3) and img.dtype == np.uint8


def _write_kitti_png(path, flow, valid):
    """frame_utils writeFlowKITTI: uint16 png, channels (u*64+2^15, v*64+2^15,
    valid)."""
    import cv2

    h, w = flow.shape[:2]
    out = np.zeros((h, w, 3), np.uint16)
    out[..., :2] = (flow * 64.0 + 2 ** 15).astype(np.uint16)
    out[..., 2] = valid.astype(np.uint16)
    cv2.imwrite(str(path), out[..., ::-1])  # cv2 writes BGR order


def test_kitti_layout_and_sparse_read(tmp_path):
    """KITTI-2015 dir layout + 16-bit sparse flow roundtrip
    (utils/raft/raft/datasets.py:161-177)."""
    import imageio.v2 as imageio

    from vst.flow.datasets import KITTIFlow

    rng = np.random.RandomState(0)
    img_dir = tmp_path / "training" / "image_2"
    flow_dir = tmp_path / "training" / "flow_occ"
    img_dir.mkdir(parents=True)
    flow_dir.mkdir(parents=True)
    H, W = 16, 24
    flow = (rng.rand(H, W, 2) * 20 - 10).round(2).astype(np.float32)
    valid = (rng.rand(H, W) > 0.3).astype(np.float32)
    for k in range(2):
        for suf in ("10", "11"):
            imageio.imwrite(img_dir / f"00000{k}_{suf}.png",
                            (rng.rand(H, W, 3) * 255).astype(np.uint8))
        _write_kitti_png(flow_dir / f"00000{k}_10.png", flow, valid)

    ds = KITTIFlow(str(tmp_path), split="training")
    assert len(ds) == 2
    i1, i2, f, v = ds[0]
    assert i1.shape == (H, W, 3) and f.shape == (H, W, 2)
    np.testing.assert_allclose(f, flow, atol=1 / 64.0)
    np.testing.assert_array_equal(v, valid)

    ds_test = KITTIFlow(str(tmp_path), split="training")
    assert ds_test.flow_list  # training split has labels


def test_hd1k_layout(tmp_path):
    """HD1K per-sequence consecutive pairs; the last frame of each sequence
    has no pair (datasets.py:180-196)."""
    import imageio.v2 as imageio

    from vst.flow.datasets import HD1KFlow

    rng = np.random.RandomState(1)
    H, W = 16, 24
    img_dir = tmp_path / "hd1k_input" / "image_2"
    flow_dir = tmp_path / "hd1k_flow_gt" / "flow_occ"
    img_dir.mkdir(parents=True)
    flow_dir.mkdir(parents=True)
    for seq in range(2):
        for fr in range(3):
            # HD1K ships grayscale frames
            imageio.imwrite(img_dir / ("%06d_%04d.png" % (seq, fr)),
                            (rng.rand(H, W) * 255).astype(np.uint8))
            _write_kitti_png(flow_dir / ("%06d_%04d.png" % (seq, fr)),
                             rng.rand(H, W, 2).astype(np.float32),
                             np.ones((H, W), np.float32))

    ds = HD1KFlow(str(tmp_path))
    # 3 flows per sequence → 2 pairs per sequence (len(flows) - 1)
    assert len(ds) == 4
    i1, i2, f, v = ds[0]
    assert i1.shape == (H, W, 3)  # grayscale replicated to 3ch
    assert v.min() == 1.0


def _write_pfm(path, arr):
    """Color PFM, little-endian (negative scale), rows bottom-to-top —
    matching vst.flow.io.read_pfm / frame_utils.py readPFM."""
    h, w = arr.shape[:2]
    with open(path, "wb") as f:
        f.write(b"PF\n")
        f.write(f"{w} {h}\n".encode())
        f.write(b"-1.0\n")
        np.flipud(arr.astype("<f4")).tofile(f)


def _make_things_tree(root, rng, H=16, W=24, n_frames=3):
    import imageio.v2 as imageio

    flows = {}
    for dstype in ("frames_cleanpass", "frames_finalpass"):
        idir = root / dstype / "TRAIN" / "A" / "0000" / "left"
        idir.mkdir(parents=True)
        for i in range(n_frames):
            imageio.imwrite(idir / f"{i:04d}.png",
                            (rng.rand(H, W, 3) * 255).astype(np.uint8))
    for direction in ("into_future", "into_past"):
        fdir = root / "optical_flow" / "TRAIN" / "A" / "0000" / direction / "left"
        fdir.mkdir(parents=True)
        for i in range(n_frames):
            fl = np.zeros((H, W, 3), np.float32)
            fl[..., 0] = i + 1.0  # distinguishable per-index flow
            fl[..., 1] = -(i + 1.0)
            _write_pfm(fdir / f"{i:04d}.pfm", fl)
            flows[(direction, i)] = fl[..., :2]
    return flows


def test_flyingthings_layout_and_pfm_read(tmp_path):
    """FlyingThings3D dir walk + PFM flow read + direction pairing
    (datasets.py:137-158): into_future pairs (i,i+1)↔flow[i]; into_past
    pairs (i+1,i)↔flow[i+1]."""
    from vst.flow.datasets import FlyingThings3D

    rng = np.random.RandomState(2)
    flows = _make_things_tree(tmp_path, rng)

    ds = FlyingThings3D(str(tmp_path), dstype="frames_cleanpass")
    # 3 flows → 2 pairs per direction → 4 samples
    assert len(ds) == 4
    i1, i2, f, v = ds[0]  # first into_future pair → flow[0]
    assert f.shape[:2] == (16, 24)
    np.testing.assert_allclose(f, flows[("into_future", 0)], atol=1e-6)
    _, _, f_past, _ = ds[2]  # first into_past pair → flow[1]
    np.testing.assert_allclose(f_past, flows[("into_past", 1)], atol=1e-6)


def test_dataset_composition_and_stage_recipes(tmp_path):
    """__rmul__ oversampling + dispatching concat + the C+T stage recipe
    (datasets.py:199-230 fetch_dataloader semantics)."""
    from vst.flow.datasets import (ConcatFlowDataset, FlyingThings3D,
                                   fetch_flow_datasets)

    rng = np.random.RandomState(3)
    _make_things_tree(tmp_path, rng)

    clean = FlyingThings3D(str(tmp_path), dstype="frames_cleanpass")
    final = FlyingThings3D(str(tmp_path), dstype="frames_finalpass")
    n = len(clean)
    both = 2 * clean + final
    assert isinstance(both, ConcatFlowDataset)
    assert len(both) == 3 * n
    # index past the first member dispatches into the second
    i1, _, f, _ = both[2 * n]
    assert f.shape[-1] == 2

    ds = fetch_flow_datasets(
        "things", {"things": str(tmp_path)}, crop_size=(8, 12))
    assert len(ds) == 2 * n
