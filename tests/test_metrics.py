"""FID / LPIPS / inception tests."""

import pytest
import numpy as np
import torch
import jax
import jax.numpy as jnp

from vst.metrics.fid import (
    InceptionV3, frechet_distance, fid_from_activations, fid_from_image_batches,
)
from vst.metrics.inception import InceptionV3Trunk, inception_params_from_torch
from vst.metrics.lpips import (
    LPIPS, lpips_pairwise, load_lin_weights, alexnet_params_from_torch, MU, SIGMA,
)


def test_frechet_distance_identity_zero():
    rng = np.random.RandomState(0)
    a = rng.randn(200, 16).astype(np.float64)
    assert abs(fid_from_activations(a, a)) < 1e-6
    b = a + 3.0
    # pure mean shift: FID = Σ(Δμ)² = 16·9
    np.testing.assert_allclose(fid_from_activations(a, b), 16 * 9.0, rtol=1e-6)


@pytest.mark.slow
def test_inception_trunk_shapes():
    net = InceptionV3Trunk()
    x = jnp.zeros((1, 96, 96, 3))
    params = net.init(jax.random.PRNGKey(0), x)
    y = net.apply(params, x)
    assert y.shape == (1, 2048)


@pytest.mark.slow
def test_inception_converter_roundtrip():
    """Fabricate a torchvision-layout sd from our params; converting it back
    must reproduce the original forward exactly."""
    net = InceptionV3Trunk()
    x = jnp.asarray(np.random.RandomState(1).rand(1, 96, 96, 3).astype(np.float32))
    params = net.init(jax.random.PRNGKey(0), x)["params"]

    sd = {}

    def walk(tree, prefix):
        for k, v in tree.items():
            if isinstance(v, dict):
                if set(v) >= {"bn_mean", "bn_var", "bn_scale", "bn_bias"}:
                    kern = np.asarray(v["conv"]["kernel"])
                    sd[prefix + k + ".conv.weight"] = torch.from_numpy(
                        np.ascontiguousarray(kern.transpose(3, 2, 0, 1)))
                    sd[prefix + k + ".bn.weight"] = torch.from_numpy(np.asarray(v["bn_scale"]))
                    sd[prefix + k + ".bn.bias"] = torch.from_numpy(np.asarray(v["bn_bias"]))
                    sd[prefix + k + ".bn.running_mean"] = torch.from_numpy(np.asarray(v["bn_mean"]))
                    sd[prefix + k + ".bn.running_var"] = torch.from_numpy(np.asarray(v["bn_var"]))
                else:
                    walk(v, prefix + k + ".")

    walk(params, "")
    converted = inception_params_from_torch(sd)
    y0 = net.apply({"params": params}, x)
    y1 = net.apply({"params": converted}, x)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_fid_from_image_batches_runs():
    inc = InceptionV3(seed=0)
    rng = np.random.RandomState(2)
    b1 = [rng.rand(2, 96, 96, 3).astype(np.float32) for _ in range(2)]
    b2 = [rng.rand(2, 96, 96, 3).astype(np.float32) + 0.1 for _ in range(2)]
    fid = fid_from_image_batches(inc, b1, b2)
    assert np.isfinite(fid) and fid >= 0


def test_lpips_matches_torch_functional():
    """Same alexnet weights + vendored lin weights, torch functional golden."""
    lp = LPIPS(seed=0)
    rng = np.random.RandomState(3)
    x = rng.rand(2, 64, 64, 3).astype(np.float32) * 2 - 1
    y = rng.rand(2, 64, 64, 3).astype(np.float32) * 2 - 1
    got = lp(x, y)

    # torch golden with OUR params
    import torch.nn.functional as TF

    def conv(name, t, stride=1, pad=0):
        w = torch.from_numpy(
            np.asarray(lp.params[name]["kernel"]).transpose(3, 2, 0, 1).copy())
        b = torch.from_numpy(np.asarray(lp.params[name]["bias"]).copy())
        return TF.conv2d(t, w, b, stride=stride, padding=pad)

    def feats(t):
        taps = []
        h = TF.relu(conv("conv0", t, 4, 2)); taps.append(h)
        h = TF.max_pool2d(h, 3, 2)
        h = TF.relu(conv("conv3", h, 1, 2)); taps.append(h)
        h = TF.max_pool2d(h, 3, 2)
        h = TF.relu(conv("conv6", h, 1, 1)); taps.append(h)
        h = TF.relu(conv("conv8", h, 1, 1)); taps.append(h)
        h = TF.relu(conv("conv10", h, 1, 1)); taps.append(h)
        return taps

    def norm(t, eps=1e-10):
        return t * torch.rsqrt(torch.sum(t ** 2, dim=1, keepdim=True) + eps)

    mu = torch.tensor(MU).view(1, 3, 1, 1)
    sig = torch.tensor(SIGMA).view(1, 3, 1, 1)
    tx = (torch.from_numpy(x).permute(0, 3, 1, 2) - mu) / sig
    ty = (torch.from_numpy(y).permute(0, 3, 1, 2) - mu) / sig
    want = 0.0
    lins = load_lin_weights()
    for fx, fy, w in zip(feats(tx), feats(ty), lins):
        d = (norm(fx) - norm(fy)) ** 2
        wt = torch.from_numpy(w).view(1, -1, 1, 1)
        want += torch.mean(torch.sum(d * wt, dim=1)).item()

    np.testing.assert_allclose(got, want, rtol=1e-3)


def test_lpips_pairwise():
    lp = LPIPS(seed=0)
    rng = np.random.RandomState(4)
    group = [rng.rand(1, 64, 64, 3).astype(np.float32) * 2 - 1 for _ in range(3)]
    v = lpips_pairwise(lp, group)
    assert np.isfinite(v) and v > 0
    assert lp(group[0], group[0]) < 1e-6
