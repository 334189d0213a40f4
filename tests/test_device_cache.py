"""Device-resident corpus cache: quantized upload + on-device batch gather."""

import os

import numpy as np
import jax.numpy as jnp

from vst.data.device_cache import DeviceFC2Cache, DeviceStyledCache


def _mini_corpus(root, n=6, hw=(32, 32), num_dom=3):
    import imageio.v2 as imageio

    rng = np.random.RandomState(0)
    os.makedirs(os.path.join(root, "DATAFiles"))
    for k in range(num_dom):
        os.makedirs(os.path.join(root, "styled-files", f"style{k}"))
        os.makedirs(os.path.join(root, "styled-files3", f"style{k}"))
    for i in range(n):
        name = f"{i:07d}"
        d = rng.rand(1, hw[0], hw[1], 9).astype(np.float32)
        d[..., 7:9] = d[..., 7:9] * 4 - 2  # flow-ish range
        np.save(os.path.join(root, "DATAFiles", name + ".npy"), d)
        for k in range(num_dom):
            img = (rng.rand(hw[0], hw[1], 3) * 255).astype(np.uint8)
            imageio.imwrite(os.path.join(
                root, "styled-files", f"style{k}", name + ".jpg"), img)
            imageio.imwrite(os.path.join(
                root, "styled-files3", f"style{k}", name + "_2.jpg"), img)
    return root


def test_fc2_cache_batch_layout_and_quantization(tmp_path):
    root = _mini_corpus(str(tmp_path))
    cache = DeviceFC2Cache(os.path.join(root, "DATAFiles"))
    b = cache.sample(4)
    assert b["imgs"].shape == (4, 2, 32, 32, 3)
    assert b["masks"].shape == (4, 1, 32, 32, 1)
    assert b["flows"].shape == (4, 1, 32, 32, 2)
    assert b["imgs"].dtype == jnp.float32
    # dequantized values within u8/f16 quantization error of the originals
    raw = np.load(os.path.join(root, "DATAFiles", "0000000.npy"))[0]
    i0 = int(np.asarray(cache._rng.__class__(0).randint(0, 6, size=(4,))[0]))
    del i0  # rng state consumed by sample; just check value ranges
    assert float(b["imgs"].max()) <= 1.0 and float(b["imgs"].min()) >= 0.0
    assert abs(float(b["flows"].max())) <= 2.1
    assert set(np.unique(np.asarray(b["masks"]))) <= {0.0, 1.0}
    assert np.isfinite(raw).all()


def test_styled_cache_sampling_and_range(tmp_path):
    root = _mini_corpus(str(tmp_path))
    cache = DeviceStyledCache(root, num_dom=3)
    b = cache.sample(8)
    assert b["x_src"].shape == (8, 32, 32, 3)
    assert float(b["x_src"].min()) >= -1.0 - 1e-5
    assert float(b["x_src"].max()) <= 1.0 + 1e-5
    # entry kinds keep src/ref in {0} ∪ {1..num_dom-1} with 0 present
    ys = np.asarray(b["y_src"]); yr = np.asarray(b["y_ref"])
    assert ys.min() >= 0 and ys.max() < 3 and yr.min() >= 0 and yr.max() < 3

    m = cache.sample_multidomain(8)
    assert np.asarray(m["y_ref"]).shape == (8,)

    c = cache.sample_cyclegan(4, sid=2)
    assert c["real_A"].shape == (4, 32, 32, 3)
    assert c["real_B"].shape == (4, 32, 32, 3)
    assert c["mask"].shape == (4, 32, 32, 1)
    assert c["flow"].shape == (4, 32, 32, 2)


def test_fc2_cache_gather_matches_host_values(tmp_path):
    root = _mini_corpus(str(tmp_path))
    cache = DeviceFC2Cache(os.path.join(root, "DATAFiles"))
    b = cache._sample(cache.imgs, cache.masks, cache.flows,
                      jnp.asarray([2, 5], jnp.int32))
    raw = np.load(os.path.join(root, "DATAFiles", "0000002.npy"))[0]
    np.testing.assert_allclose(
        np.asarray(b["imgs"][0, 0]), np.clip(raw[:, :, 0:3], 0, 1),
        atol=1.0 / 255.0 + 1e-6)
    np.testing.assert_allclose(
        np.asarray(b["flows"][0, 0]), raw[:, :, 7:9], atol=2e-3)
