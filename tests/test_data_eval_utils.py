"""Datagen / Sintel dataset / video + debug utility tests."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vst.data.datagen import (
    generate_styled_dataset, precompute_lt_flow, pack_fc2_npy, to_grayscale3,
)
from vst.data.sintel import SintelDataset
from vst.data.loader import NpyDirDataset
from vst.eval.video import (
    make_videos, image_grid, denormalize, latent_interpolation_video,
    translate_and_reconstruct,
)
from vst.flow.io import write_flo
from vst.data.synthetic import AffineMotionGenerator, _texture


def test_pack_and_load_fc2_npy(tmp_path):
    d = str(tmp_path / "DATAFiles")
    pack_fc2_npy(d, 4, hw=(32, 32), seed=0)
    ds = NpyDirDataset(d, batch_size=2, expected_size=4)
    batches = list(ds.epoch())
    assert len(batches) == 2
    b = batches[0]
    assert b["imgs"].shape == (2, 2, 32, 32, 3)
    assert b["masks"].shape == (2, 1, 32, 32, 1)
    assert b["flows"].shape == (2, 1, 32, 32, 2)


@pytest.mark.slow
def test_generate_styled_dataset(tmp_path):
    from vst.models.gatys import OBST
    from vst.data.styles import load_style_images

    rng = np.random.RandomState(0)
    contents = [(f"{i:07d}", rng.rand(40, 40, 3).astype(np.float32))
                for i in range(2)]
    styles = load_style_images(size=32)[:3]
    obst = OBST(max_iters=(2, 2), seed=0)
    out = str(tmp_path / "styled-files")
    generate_styled_dataset(
        contents, styles, out, obst=obst,
        pyr_shapes=((16, 16), (32, 32)), batch_size=2,
    )
    for k in range(4):
        files = os.listdir(os.path.join(out, f"style{k}"))
        assert len(files) == 2, (k, files)
    # style3 must be grayscale
    import imageio.v2 as imageio

    img = imageio.imread(os.path.join(out, "style3", "0000000.jpg"))
    assert np.abs(img[..., 0].astype(int) - img[..., 1].astype(int)).max() <= 1


def test_precompute_lt_flow(tmp_path):
    frames = np.random.RandomState(1).rand(7, 32, 32, 3).astype(np.float32)

    def stub_raft(i1, i2):
        d = jnp.mean(i1 - i2, axis=-1, keepdims=True)
        return None, jnp.concatenate([d, -d], axis=-1)

    out = precompute_lt_flow(frames, stub_raft, out_dir=str(tmp_path / "lt"))
    assert len(out) == 2  # frames 5 and 6
    assert out[0].shape == (1, 32, 32, 3)
    assert sorted(os.listdir(tmp_path / "lt")) == ["frame_0005.npy", "frame_0006.npy"]


def test_sintel_dataset_reverse_order(tmp_path):
    """Reference quirk: lists sorted reverse; idx 0 gets zero flow/mask."""
    import imageio.v2 as imageio

    vid = "alley_1"
    for sub in ("final", "flow", "occlusions"):
        os.makedirs(tmp_path / sub / vid)
    H, W = 16, 24
    for t in range(3):
        imageio.imwrite(
            str(tmp_path / "final" / vid / f"frame_{t:04d}.png"),
            np.full((H, W, 3), t * 40, np.uint8),
        )
    for t in range(2):
        write_flo(str(tmp_path / "flow" / vid / f"frame_{t:04d}.flo"),
                  np.full((H, W, 2), t + 1, np.float32))
        imageio.imwrite(
            str(tmp_path / "occlusions" / vid / f"frame_{t:04d}.png"),
            np.zeros((H, W), np.uint8),
        )

    ds = SintelDataset(str(tmp_path), vid)
    assert len(ds) == 3
    f0, m0, fl0, _ = ds[0]
    # reverse order → idx 0 is the LAST frame (value 80/255)
    np.testing.assert_allclose(f0[0, 0, 0], 80 / 255, rtol=1e-3)
    assert fl0.max() == 0 and m0.max() == 0
    f1, m1, fl1, _ = ds[1]
    # flows_list reversed: idx 1 reads flows_list[0] = frame_0001.flo (value 2)
    assert fl1.max() == 2.0
    assert m1.min() == 1.0  # inverted zero occlusion mask


def test_make_videos_and_grid(tmp_path):
    import imageio.v2 as imageio

    d = tmp_path / "clips" / "alley_1_s1"
    os.makedirs(d)
    for i in range(4):
        imageio.imwrite(str(d / f"frame_{i:04d}.png"),
                        np.full((16, 16, 3), i * 30, np.uint8))
    vids = make_videos(str(tmp_path / "clips"))
    assert len(vids) == 1 and "alley_1_s1" in vids[0]
    assert os.path.getsize(vids[0]) > 0

    g = image_grid([[np.zeros((4, 4, 3)), np.ones((4, 4, 3))]])
    assert g.shape == (4, 8, 3)


def test_debug_grid_and_latent_video(tmp_path):
    def generate(x, s):
        return x * 0.5

    def style_encode(x, y):
        return jnp.zeros((x.shape[0], 8))

    def mapping(z, y):
        return z

    x = np.random.RandomState(2).rand(2, 16, 16, 3).astype(np.float32) * 2 - 1
    grid = translate_and_reconstruct(generate, style_encode, x, 0, x[::-1], 1,
                                     filename=str(tmp_path / "dbg.png"))
    assert grid.shape == (4 * 16, 2 * 16, 3)
    assert (tmp_path / "dbg.png").exists()

    latents = np.random.RandomState(3).randn(3, 8).astype(np.float32)
    p = latent_interpolation_video(
        generate, mapping, x[0], latents, 0, str(tmp_path / "interp.mp4"),
        steps_per_pair=4,
    )
    assert os.path.getsize(p) > 0


def test_native_loader_matches_numpy(tmp_path):
    from vst.data.native_loader import load_npy_batch, native_available

    shape = (1, 16, 16, 9)
    paths = []
    for i in range(5):
        a = np.random.RandomState(i).randn(*shape).astype(np.float32)
        p = str(tmp_path / f"{i}.npy")
        np.save(p, a)
        paths.append(p)
    got = load_npy_batch(paths, shape)
    want = np.stack([np.load(p) for p in paths])
    np.testing.assert_array_equal(got, want)
    # native build should succeed in this environment (g++ present)
    assert native_available()


def test_native_loader_fallback_on_unsupported(tmp_path):
    """float64 files aren't handled natively → per-file numpy fallback."""
    from vst.data.native_loader import load_npy_batch

    shape = (4, 4)
    p = str(tmp_path / "f64.npy")
    a = np.random.RandomState(0).randn(*shape)  # float64
    np.save(p, a)
    got = load_npy_batch([p], shape)
    np.testing.assert_allclose(got[0], a.astype(np.float32), rtol=1e-6)


@pytest.mark.slow
def test_experiments_harness():
    from vst.train.experiments import train_net, infer_test
    from vst.data.synthetic import synthetic_batch

    trainer, state, losses = train_net("johnson", steps=3, batch_size=2,
                                       hw=(32, 32))
    assert len(losses) == 3 and np.isfinite(losses[-1]["loss"])
    clip = synthetic_batch(1, hw=(32, 32), n_frames=2, seed=5)["imgs"][0]
    styled, st, lt = infer_test(trainer, state, clip)
    assert styled.shape == clip.shape and np.isfinite(st)


def test_visualizer_html_gallery(tmp_path):
    from vst.core.visualizer import Visualizer

    viz = Visualizer(str(tmp_path), name="t")
    imgs = {"real_A": np.zeros((8, 8, 3)), "fake_B": np.ones((8, 8, 3))}
    viz.display_current_results(imgs, epoch=1)
    msg = viz.print_current_losses(1, 100, {"G_A": 0.5, "D_A": 0.25})
    assert "G_A: 0.500" in msg
    assert (tmp_path / "web" / "index.html").exists()
    assert (tmp_path / "web" / "images" / "epoch001_fake_B.png").exists()
    assert (tmp_path / "loss_log.txt").read_text().count("\n") >= 2


def test_tuple_npy_dataset_roundtrip(tmp_path):
    from vst.data.loader import TupleNpyDataset, pack_tuple_npy

    d = str(tmp_path / "CO2")
    pack_tuple_npy(d, 4, hw=(32, 32), n_frames=3, seed=0)
    ds = TupleNpyDataset(d, batch_size=2, expected_size=4)
    batches = list(ds.epoch())
    assert len(batches) == 2
    b = batches[0]
    assert b["imgs"].shape == (2, 3, 32, 32, 3)
    assert b["flows"].shape == (2, 2, 32, 32, 2)
    assert b["masks"].shape == (2, 2, 32, 32, 1)
