"""Parity tests: VGG trunks vs torch Sequential goldens (random weights)."""

import numpy as np
import torch
import torch.nn as tnn
import jax
import jax.numpy as jnp

from vst.perceptual.vgg import (
    Vgg16Features,
    Vgg19Features,
    CaffeVGG,
    vgg16_params_from_torch,
    vgg19_params_from_torch,
    caffe_vgg_params_from_torch,
    obst_prep,
    obst_postp,
    VGG16_CFG,
    VGG19_CFG,
)


def _build_torch_features(cfg):
    """torchvision-style `features` Sequential from a cfg list."""
    layers = []
    in_ch = 3
    for c in cfg:
        if c == "M":
            layers.append(tnn.MaxPool2d(2, 2))
        else:
            layers.append(tnn.Conv2d(in_ch, c, 3, padding=1))
            layers.append(tnn.ReLU(inplace=False))
            in_ch = c
    return tnn.Sequential(*layers)


def _taps_torch(feats, x, tap_indices):
    outs = []
    h = x
    for i, layer in enumerate(feats):
        h = layer(h)
        if i in tap_indices:
            outs.append(h)
        if i >= max(tap_indices):
            break
    return outs


def test_vgg16_features_parity():
    torch.manual_seed(0)
    feats = _build_torch_features(VGG16_CFG)
    sd = {f"features.{k}": v for k, v in feats.state_dict().items()}

    x = np.random.RandomState(1).rand(2, 32, 40, 3).astype(np.float32)
    model = Vgg16Features()
    params = {"params": vgg16_params_from_torch(sd)}
    got = model.apply(params, jnp.asarray(x))

    want = _taps_torch(feats, torch.from_numpy(x).permute(0, 3, 1, 2), (3, 8, 15, 22))
    assert len(got) == 4
    for g, w in zip(got, want):
        np.testing.assert_allclose(
            np.asarray(g), w.detach().permute(0, 2, 3, 1).numpy(), rtol=1e-3, atol=1e-4
        )


def test_vgg19_features_parity():
    torch.manual_seed(1)
    feats = _build_torch_features(VGG19_CFG)
    sd = {f"features.{k}": v for k, v in feats.state_dict().items()}

    x = np.random.RandomState(2).rand(1, 32, 32, 3).astype(np.float32)
    model = Vgg19Features()
    params = {"params": vgg19_params_from_torch(sd)}
    got = model.apply(params, jnp.asarray(x))

    want = _taps_torch(feats, torch.from_numpy(x).permute(0, 3, 1, 2), (1, 6, 11, 20, 29))
    assert len(got) == 5
    for g, w in zip(got, want):
        np.testing.assert_allclose(
            np.asarray(g), w.detach().permute(0, 2, 3, 1).numpy(), rtol=1e-3, atol=1e-4
        )


def test_caffe_vgg_parity():
    """CaffeVGG vs an equivalent torch graph with named convs."""
    torch.manual_seed(2)
    shapes = [
        ("conv1_1", 3, 64), ("conv1_2", 64, 64),
        ("conv2_1", 64, 128), ("conv2_2", 128, 128),
        ("conv3_1", 128, 256), ("conv3_2", 256, 256), ("conv3_3", 256, 256),
        ("conv3_4", 256, 256),
        ("conv4_1", 256, 512), ("conv4_2", 512, 512), ("conv4_3", 512, 512),
        ("conv4_4", 512, 512),
        ("conv5_1", 512, 512),
    ]
    convs = {n: tnn.Conv2d(i, o, 3, padding=1) for n, i, o in shapes}
    sd = {}
    for n, conv in convs.items():
        sd[n + ".weight"] = conv.weight
        sd[n + ".bias"] = conv.bias

    x = np.random.RandomState(3).rand(1, 32, 32, 3).astype(np.float32)
    model = CaffeVGG(pool="max")
    params = {"params": caffe_vgg_params_from_torch(sd)}
    keys = ["r21", "r31", "r41", "r42", "r51"]
    got = model.apply(params, jnp.asarray(x), keys)

    # torch forward
    h = torch.from_numpy(x).permute(0, 3, 1, 2)
    out = {}
    pool = tnn.MaxPool2d(2, 2)
    import torch.nn.functional as TF

    out["r11"] = TF.relu(convs["conv1_1"](h))
    out["r12"] = TF.relu(convs["conv1_2"](out["r11"]))
    out["p1"] = pool(out["r12"])
    out["r21"] = TF.relu(convs["conv2_1"](out["p1"]))
    out["r22"] = TF.relu(convs["conv2_2"](out["r21"]))
    out["p2"] = pool(out["r22"])
    out["r31"] = TF.relu(convs["conv3_1"](out["p2"]))
    out["r32"] = TF.relu(convs["conv3_2"](out["r31"]))
    out["r33"] = TF.relu(convs["conv3_3"](out["r32"]))
    out["r34"] = TF.relu(convs["conv3_4"](out["r33"]))
    out["p3"] = pool(out["r34"])
    out["r41"] = TF.relu(convs["conv4_1"](out["p3"]))
    out["r42"] = TF.relu(convs["conv4_2"](out["r41"]))
    out["r43"] = TF.relu(convs["conv4_3"](out["r42"]))
    out["r44"] = TF.relu(convs["conv4_4"](out["r43"]))
    out["p4"] = pool(out["r44"])
    out["r51"] = TF.relu(convs["conv5_1"](out["p4"]))

    for g, k in zip(got, keys):
        np.testing.assert_allclose(
            np.asarray(g),
            out[k].detach().permute(0, 2, 3, 1).numpy(),
            rtol=1e-3,
            atol=1e-4,
        )


def test_obst_prep_postp_roundtrip():
    rng = np.random.RandomState(4)
    img = rng.rand(1, 8, 8, 3).astype(np.float32)
    x = obst_prep(jnp.asarray(img))
    back = obst_postp(x)
    np.testing.assert_allclose(np.asarray(back), img, rtol=1e-4, atol=1e-5)
