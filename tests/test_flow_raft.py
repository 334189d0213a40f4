"""RAFT component parity + full-model wiring tests."""

import pytest
import numpy as np
import torch
import torch.nn.functional as F
import jax
import jax.numpy as jnp

from vst.flow.raft import (
    RAFT,
    SepConvGRU,
    upsample_flow_convex,
    upflow8,
    coords_grid,
    raft_params_from_torch,
)


def test_coords_grid():
    g = np.asarray(coords_grid(1, 3, 4))
    assert g[0, 1, 2, 0] == 2 and g[0, 1, 2, 1] == 1  # ch0 = x


def test_upflow8_matches_torch():
    flow = np.random.RandomState(0).randn(1, 4, 6, 2).astype(np.float32)
    got = upflow8(jnp.asarray(flow))
    t = torch.from_numpy(flow).permute(0, 3, 1, 2)
    want = 8 * F.interpolate(t, size=(32, 48), mode="bilinear", align_corners=True)
    np.testing.assert_allclose(
        np.asarray(got), want.permute(0, 2, 3, 1).numpy(), rtol=1e-4, atol=1e-5
    )


def test_convex_upsample_matches_torch():
    """raft.py:72-83 re-expressed with unfold for goldens."""
    rng = np.random.RandomState(1)
    B, H, W = 2, 4, 5
    flow = rng.randn(B, H, W, 2).astype(np.float32)
    mask = rng.randn(B, H, W, 64 * 9).astype(np.float32)

    got = upsample_flow_convex(jnp.asarray(flow), jnp.asarray(mask))

    tf = torch.from_numpy(flow).permute(0, 3, 1, 2)
    tm = torch.from_numpy(mask).permute(0, 3, 1, 2)
    m = tm.view(B, 1, 9, 8, 8, H, W)
    m = torch.softmax(m, dim=2)
    up_flow = F.unfold(8 * tf, [3, 3], padding=1)
    up_flow = up_flow.view(B, 2, 9, 1, 1, H, W)
    up_flow = torch.sum(m * up_flow, dim=2)
    up_flow = up_flow.permute(0, 1, 4, 2, 5, 3)
    want = up_flow.reshape(B, 2, 8 * H, 8 * W).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_sepconv_gru_matches_torch():
    """update.py:33-60 with random weights, functional torch golden."""
    rng = np.random.RandomState(2)
    hd, ind = 8, 12
    B, H, W = 1, 6, 7
    h0 = rng.randn(B, H, W, hd).astype(np.float32)
    x0 = rng.randn(B, H, W, ind).astype(np.float32)

    gru = SepConvGRU(hidden_dim=hd)
    params = gru.init(jax.random.PRNGKey(0), jnp.asarray(h0), jnp.asarray(x0))
    got = gru.apply(params, jnp.asarray(h0), jnp.asarray(x0))

    def w(name):
        k = np.asarray(params["params"][name]["Conv_0"]["kernel"])
        b = np.asarray(params["params"][name]["Conv_0"]["bias"])
        return torch.from_numpy(k.transpose(3, 2, 0, 1)), torch.from_numpy(b)

    th = torch.from_numpy(h0).permute(0, 3, 1, 2)
    tx = torch.from_numpy(x0).permute(0, 3, 1, 2)
    for tag, pad in (("1", (0, 2)), ("2", (2, 0))):
        hx = torch.cat([th, tx], dim=1)
        wz, bz = w(f"convz{tag}")
        wr, br = w(f"convr{tag}")
        wq, bq = w(f"convq{tag}")
        z = torch.sigmoid(F.conv2d(hx, wz, bz, padding=pad))
        r = torch.sigmoid(F.conv2d(hx, wr, br, padding=pad))
        q = torch.tanh(F.conv2d(torch.cat([r * th, tx], dim=1), wq, bq, padding=pad))
        th = (1 - z) * th + z * q
    want = th.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_raft_full_forward_shapes():
    raft = RAFT(small=False, iters=3)
    img1 = jnp.asarray(np.random.RandomState(3).rand(1, 64, 96, 3).astype(np.float32) * 255)
    img2 = jnp.asarray(np.random.RandomState(4).rand(1, 64, 96, 3).astype(np.float32) * 255)
    params = raft.init(jax.random.PRNGKey(0), img1, img2)
    low, up = raft.apply(params, img1, img2)
    assert low.shape == (1, 8, 12, 2)
    assert up.shape == (1, 64, 96, 2)
    assert np.isfinite(np.asarray(up)).all()
    n = sum(x.size for x in jax.tree_util.tree_leaves(params))
    assert abs(n - 5_257_536) < 50_000, n  # real RAFT ≈ 5.26M params


@pytest.mark.slow
def test_raft_warm_start_changes_result():
    """flow_init warm start (raft.py:118-119) must influence the output."""
    raft = RAFT(small=False, iters=2)
    rng = np.random.RandomState(5)
    img1 = jnp.asarray(rng.rand(1, 32, 32, 3).astype(np.float32) * 255)
    img2 = jnp.asarray(rng.rand(1, 32, 32, 3).astype(np.float32) * 255)
    params = raft.init(jax.random.PRNGKey(0), img1, img2)
    _, up0 = raft.apply(params, img1, img2)
    init = jnp.ones((1, 4, 4, 2)) * 2.0
    _, up1 = raft.apply(params, img1, img2, flow_init=init)
    assert not np.allclose(np.asarray(up0), np.asarray(up1), atol=1e-4)


@pytest.mark.slow
def test_torch_state_dict_conversion_structure():
    """Round-trip: fabricate a torch-layout state dict from our param tree's
    shapes, convert, and verify flax.apply accepts it (strict structure +
    shape matching is flax's own validation)."""
    raft = RAFT(small=False, iters=2)
    img = jnp.zeros((1, 32, 32, 3))
    params = raft.init(jax.random.PRNGKey(0), img, img)["params"]

    sd = {}

    def torchify(tree, prefix):
        for k, v in tree.items():
            if isinstance(v, dict):
                if k == "Conv_0":
                    kern = np.asarray(v["kernel"])
                    sd[prefix + ".weight"] = torch.from_numpy(
                        np.ascontiguousarray(kern.transpose(3, 2, 0, 1))
                    )
                    if "bias" in v:
                        sd[prefix + ".bias"] = torch.from_numpy(np.asarray(v["bias"]))
                else:
                    torchify(v, prefix + "." + k if prefix else k)
            else:
                leaf = {"scale": "weight", "bias": "bias",
                        "running_mean": "running_mean", "running_var": "running_var"}[k]
                sd[prefix + "." + leaf] = torch.from_numpy(np.asarray(v))

    torchify(params, "")

    # rewrite our naming to torch layout: layer{i}_{j} → layer{i}.{j},
    # update_iter.block → update_block, mask_{i} → mask.{i},
    # downsample conv → downsample.0, norm3 (strided block) → downsample.1
    remap = {}
    for k, v in sd.items():
        nk = k.lstrip(".")
        nk = nk.replace("update_iter.block", "update_block")
        # the upsample-mask head is hoisted to the RAFT top level in flax
        # but lives under update_block in the torch layout
        nk = nk.replace("mask_head.", "update_block.")
        for i in (1, 2, 3):
            for j in (0, 1):
                nk = nk.replace(f"layer{i}_{j}.", f"layer{i}.{j}.")
        nk = nk.replace("mask_0", "mask.0").replace("mask_2", "mask.2")
        nk = nk.replace("downsample.weight", "downsample.0.weight")
        nk = nk.replace("downsample.bias", "downsample.0.bias")
        remap[nk] = v

    # norm3 inside strided ResidualBlocks lives at downsample.1 in torch
    fixed = {}
    for k, v in remap.items():
        if (".norm3." in k) and ("layer2.0" in k or "layer3.0" in k):
            k = k.replace(".norm3.", ".downsample.1.")
        fixed[k] = v

    converted = raft_params_from_torch(fixed)
    # strict: applying with the converted tree must succeed and reproduce
    # the original forward exactly
    rng = np.random.RandomState(6)
    img1 = jnp.asarray(rng.rand(1, 32, 32, 3).astype(np.float32) * 255)
    img2 = jnp.asarray(rng.rand(1, 32, 32, 3).astype(np.float32) * 255)
    _, up_orig = raft.apply({"params": params}, img1, img2)
    _, up_conv = raft.apply({"params": converted}, img1, img2)
    np.testing.assert_allclose(np.asarray(up_orig), np.asarray(up_conv), rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_raft_bf16_encoders_close_to_f32():
    """encoder_dtype=bf16 shares the SAME param tree and stays close to the
    f32 flow (the production eval path runs bf16 encoders on TPU)."""
    rng = np.random.RandomState(3)
    img1 = jnp.asarray(rng.rand(1, 64, 96, 3).astype(np.float32) * 255)
    img2 = jnp.asarray(rng.rand(1, 64, 96, 3).astype(np.float32) * 255)

    r32 = RAFT(small=True, iters=4)
    r16 = RAFT(small=True, iters=4, encoder_dtype=jnp.bfloat16)
    params = r32.init(jax.random.PRNGKey(0), img1, img2)
    # identical tree: bf16 is a compute policy, not a different model
    jax.tree.map(lambda a, b: None, params,
                 r16.init(jax.random.PRNGKey(0), img1, img2))

    _, f32 = r32.apply(params, img1, img2)
    _, f16 = r16.apply(params, img1, img2)
    assert f16.dtype == jnp.float32  # bf16 never leaks out of the encoders
    denom = np.abs(np.asarray(f32)).mean() + 1e-6
    rel = np.abs(np.asarray(f32) - np.asarray(f16)).mean() / denom
    assert rel < 0.15, rel


@pytest.mark.slow
def test_raft_bf16_update_block_close_to_f32():
    """update_dtype=bf16 (GRU gates/motion encoder in bf16, f32 hidden
    state + delta conv) shares the param tree and stays close."""
    rng = np.random.RandomState(4)
    img1 = jnp.asarray(rng.rand(1, 64, 96, 3).astype(np.float32) * 255)
    img2 = jnp.asarray(rng.rand(1, 64, 96, 3).astype(np.float32) * 255)

    r32 = RAFT(small=False, iters=4)
    r16 = RAFT(small=False, iters=4, encoder_dtype=jnp.bfloat16,
               update_dtype=jnp.bfloat16)
    params = r32.init(jax.random.PRNGKey(0), img1, img2)
    jax.tree.map(lambda a, b: None, params,
                 r16.init(jax.random.PRNGKey(0), img1, img2))
    _, f32 = r32.apply(params, img1, img2)
    _, f16 = r16.apply(params, img1, img2)
    assert f16.dtype == jnp.float32
    denom = np.abs(np.asarray(f32)).mean() + 1e-6
    rel = np.abs(np.asarray(f32) - np.asarray(f16)).mean() / denom
    assert rel < 0.2, rel


def test_raft_rejects_non_multiple_of_8():
    """Same contract as the reference: sintel frames (436 high) must go
    through InputPadder (utils/raft/raft/utils/utils.py:9-24) before RAFT.
    At H=436 the ceil-mode encoder fmap (55 rows) disagrees with the H//8
    coords grid (54) — the model must fail loudly, not with a reshape error
    deep inside the corr lookup."""
    raft = RAFT(small=True, iters=2)
    img = jnp.zeros((1, 52, 64, 3), jnp.float32)  # 52 % 8 == 4
    with pytest.raises(ValueError, match="divisible by 8"):
        raft.init(jax.random.PRNGKey(0), img, img)


@pytest.mark.slow
def test_make_raft_pads_init_to_multiple_of_8():
    """cli._make_raft at Sintel hw=(436,1024) must init at the padded shape
    (regression: round-3 wave-2 evals all crashed in raft.init)."""
    import argparse

    from vst.cli.__main__ import _make_raft
    from vst.ops.image import InputPadder

    args = argparse.Namespace(hw=(52, 64), raft_iters=2, raft_ckpt=None,
                              raft_bf16=False)
    apply_fn = _make_raft(args)
    img = jnp.zeros((1, 52, 64, 3), jnp.float32)
    padder = InputPadder(img.shape)
    i1, i2 = padder.pad(img, img)
    _, up = apply_fn(i1, i2)
    assert padder.unpad(up).shape == (1, 52, 64, 2)
