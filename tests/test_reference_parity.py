"""Full-net forward parity against the LIVING reference implementation.

These tests import the reference's actual torch modules from
``/root/reference`` (read-only), build them with seeded random weights, run
the vst state-dict converters, and assert the vst forward outputs match the
torch outputs. This retires the risk that converters were only ever tested
against fabricated state dicts (VERDICT round 1, item 3).

Nets covered (reference locations):
  * OBST caffe-VGG            methods/optimization-based/obst_eval.py:164-220
  * FastStyleNet (1/3 styles) methods/learning-based/network.py:263-298
  * RAFT (full forward)       utils/raft/raft/raft.py:86-144
  * StarGAN-v2 G/F/E/D        methods/GAN-based/StarGANv2Adv/core/model.py:135-279

The reference depends on ``torchvision`` and ``munch`` which are not in this
image; both are stubbed (nothing under test calls into them at runtime).
"""

import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

REF = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference checkout not available"
)


# ---------------------------------------------------------------------------
# stubs + import helpers
# ---------------------------------------------------------------------------

def _install_stubs():
    if "munch" not in sys.modules:
        munch = types.ModuleType("munch")

        class Munch(dict):
            def __getattr__(self, k):
                try:
                    return self[k]
                except KeyError as e:
                    raise AttributeError(k) from e

            def __setattr__(self, k, v):
                self[k] = v

        munch.Munch = Munch
        sys.modules["munch"] = munch

    if "torchvision" not in sys.modules:
        def _unavailable(*a, **k):
            raise RuntimeError("torchvision is stubbed in this test env")

        tv = types.ModuleType("torchvision")
        for sub in ("models", "transforms", "utils", "datasets"):
            mod = types.ModuleType(f"torchvision.{sub}")
            sys.modules[f"torchvision.{sub}"] = mod
            setattr(tv, sub, mod)
        for name in ("vgg16", "vgg19", "alexnet", "inception_v3"):
            setattr(tv.models, name, _unavailable)
        tv.datasets.ImageFolder = _unavailable
        tv.transforms.Compose = _unavailable
        sys.modules["torchvision"] = tv

    if "skimage" not in sys.modules:  # core/wing.py gaussian import
        def _unavailable(*a, **k):
            raise RuntimeError("skimage is stubbed in this test env")

        sk = types.ModuleType("skimage")
        filters = types.ModuleType("skimage.filters")
        filters.gaussian = _unavailable
        sk.filters = filters
        sys.modules["skimage"] = sk
        sys.modules["skimage.filters"] = filters


def _import_ref(module_name, *path_entries):
    """Import a reference module with the given sys.path prepends."""
    _install_stubs()
    for p in reversed(path_entries):
        ap = os.path.join(REF, p)
        if ap not in sys.path:
            sys.path.insert(0, ap)
    import importlib

    return importlib.import_module(module_name)


def _import_ref_file(unique_name, rel_path, *path_entries):
    """Load a reference module by file path under a collision-proof name
    (several reference dirs ship same-named modules like ``raft``)."""
    _install_stubs()
    for p in reversed(path_entries):
        ap = os.path.join(REF, p)
        if ap not in sys.path:
            sys.path.insert(0, ap)
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        unique_name, os.path.join(REF, rel_path)
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules[unique_name] = mod
    spec.loader.exec_module(mod)
    return mod


def _seed_torch_params(net, seed=0):
    """Deterministic, well-scaled random weights for every param."""
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in net.parameters():
            if p.ndim >= 2:
                fan_in = int(np.prod(p.shape[1:]))
                p.copy_(torch.randn(p.shape, generator=g) / np.sqrt(fan_in))
            else:
                p.copy_(0.1 * torch.randn(p.shape, generator=g))
    net.eval()
    return net


def _nchw(x):
    return torch.from_numpy(np.ascontiguousarray(x.transpose(0, 3, 1, 2)))


# ---------------------------------------------------------------------------
# caffe-VGG (OBST)
# ---------------------------------------------------------------------------

def test_caffe_vgg_forward_parity():
    ref = _import_ref(
        "obst_eval",
        "methods/optimization-based",
        "methods/optimization-based/raft",
    )
    tnet = _seed_torch_params(ref.VGG(pool="max"), seed=10)

    from vst.perceptual.vgg import CaffeVGG, caffe_vgg_params_from_torch

    params = caffe_vgg_params_from_torch(tnet.state_dict())
    net = CaffeVGG(pool="max")

    rng = np.random.RandomState(0)
    x = rng.randn(2, 32, 48, 3).astype(np.float32) * 40.0  # caffe-range input
    keys = ["r11", "r21", "r31", "r41", "r51", "p4"]

    with torch.no_grad():
        want = ref.VGG.forward(tnet, _nchw(x), keys)
    got = net.apply({"params": params}, jnp.asarray(x), keys)

    for k, g, w in zip(keys, got, want):
        np.testing.assert_allclose(
            np.asarray(g), w.numpy().transpose(0, 2, 3, 1),
            rtol=1e-4, atol=1e-4, err_msg=f"layer {k}",
        )


# ---------------------------------------------------------------------------
# FastStyleNet
# ---------------------------------------------------------------------------

@pytest.mark.slow
@pytest.mark.parametrize("n_styles,style_id", [(1, 0), (3, 2)])
def test_faststyle_forward_parity(n_styles, style_id):
    network = _import_ref("network", "methods/learning-based")
    tnet = _seed_torch_params(
        network.FastStyleNet(num_inp=3, n_styles=n_styles), seed=20 + n_styles
    )

    from vst.models.faststyle import FastStyleNet, faststyle_params_from_torch

    params = faststyle_params_from_torch(tnet.state_dict())
    net = FastStyleNet(n_styles=n_styles)

    rng = np.random.RandomState(1)
    x = (rng.rand(2, 32, 40, 3) * 255).astype(np.float32)
    strength = 0.7

    with torch.no_grad():
        t_feat, t_out = tnet(
            _nchw(x), style_strength=torch.tensor(strength),
            s_id=torch.tensor(style_id),
        )
    feat, out = net.apply({"params": params}, jnp.asarray(x), strength,
                          style_id)

    np.testing.assert_allclose(
        np.asarray(feat), t_feat.numpy().transpose(0, 2, 3, 1),
        rtol=1e-3, atol=1e-3,
    )
    np.testing.assert_allclose(
        np.asarray(out), t_out.numpy().transpose(0, 2, 3, 1),
        rtol=1e-3, atol=5e-3,  # tanh(x/255)·150+127.5: abs scale ~255
    )


# ---------------------------------------------------------------------------
# RAFT
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_raft_forward_parity():
    raft_mod = _import_ref_file(
        "ref_raft_core", "utils/raft/raft/raft.py", "utils/raft/raft"
    )
    import argparse

    args = argparse.Namespace(  # reference tests membership: 'x' in args
        small=False, dropout=0.0, alternate_corr=False, mixed_precision=False
    )
    tnet = _seed_torch_params(raft_mod.RAFT(args), seed=30)

    from vst.flow.raft import RAFT, raft_params_from_torch

    params = raft_params_from_torch(tnet.state_dict())
    net = RAFT(small=False, iters=8)

    rng = np.random.RandomState(2)
    # ≥128 px per side: the 4-level corr pyramid needs fmap/8 ≥ 2 at the
    # coarsest level or torch's align_corners 2/(W−1) grid divides by zero
    i1 = (rng.rand(1, 128, 160, 3) * 255).astype(np.float32)
    i2 = (rng.rand(1, 128, 160, 3) * 255).astype(np.float32)

    with torch.no_grad():
        t_low, t_up = tnet(_nchw(i1), _nchw(i2), iters=8, test_mode=True)
    low, up = net.apply({"params": params}, jnp.asarray(i1), jnp.asarray(i2))

    np.testing.assert_allclose(
        np.asarray(low), t_low.numpy().transpose(0, 2, 3, 1),
        rtol=2e-3, atol=2e-3,
    )
    np.testing.assert_allclose(
        np.asarray(up), t_up.numpy().transpose(0, 2, 3, 1),
        rtol=2e-3, atol=2e-3,
    )


# ---------------------------------------------------------------------------
# StarGAN-v2 nets
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def sg2_model():
    return _import_ref("core.model", "methods/GAN-based/StarGANv2Adv")


@pytest.mark.slow
def test_sg2_generator_parity(sg2_model):
    tnet = _seed_torch_params(
        sg2_model.Generator(img_size=64, style_dim=64, w_hpf=0), seed=40
    )

    from vst.models.stargan2 import Generator, generator_params_from_torch

    params = generator_params_from_torch(tnet.state_dict(), img_size=64)
    net = Generator(img_size=64, style_dim=64, w_hpf=0)

    rng = np.random.RandomState(3)
    x = rng.randn(2, 64, 64, 3).astype(np.float32)
    s = rng.randn(2, 64).astype(np.float32)

    with torch.no_grad():
        want = tnet(_nchw(x), torch.from_numpy(s))
    got = net.apply({"params": params}, jnp.asarray(x), jnp.asarray(s))

    np.testing.assert_allclose(
        np.asarray(got), want.numpy().transpose(0, 2, 3, 1),
        rtol=2e-3, atol=2e-3,
    )


def test_sg2_mapping_parity(sg2_model):
    tnet = _seed_torch_params(
        sg2_model.MappingNetwork(latent_dim=16, style_dim=64, num_domains=4),
        seed=41,
    )

    from vst.models.stargan2 import MappingNetwork, mapping_params_from_torch

    params = mapping_params_from_torch(tnet.state_dict())
    net = MappingNetwork(latent_dim=16, style_dim=64, num_domains=4)

    rng = np.random.RandomState(4)
    z = rng.randn(5, 16).astype(np.float32)
    y = np.array([0, 3, 1, 2, 1], np.int64)

    with torch.no_grad():
        want = tnet(torch.from_numpy(z), torch.from_numpy(y))
    got = net.apply({"params": params}, jnp.asarray(z), jnp.asarray(y))

    np.testing.assert_allclose(np.asarray(got), want.numpy(),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_sg2_style_encoder_parity(sg2_model):
    tnet = _seed_torch_params(
        sg2_model.StyleEncoder(img_size=64, style_dim=64, num_domains=4),
        seed=42,
    )

    from vst.models.stargan2 import (
        StyleEncoder,
        style_encoder_params_from_torch,
    )

    params = style_encoder_params_from_torch(tnet.state_dict(), img_size=64)
    net = StyleEncoder(img_size=64, style_dim=64, num_domains=4)

    rng = np.random.RandomState(5)
    x = rng.randn(3, 64, 64, 3).astype(np.float32)
    y = np.array([1, 0, 3], np.int64)

    with torch.no_grad():
        want = tnet(_nchw(x), torch.from_numpy(y))
    got = net.apply({"params": params}, jnp.asarray(x), jnp.asarray(y))

    np.testing.assert_allclose(np.asarray(got), want.numpy(),
                               rtol=1e-3, atol=1e-3)


def test_sg2_discriminator_parity(sg2_model):
    tnet = _seed_torch_params(
        sg2_model.Discriminator(img_size=64, num_domains=4), seed=43
    )

    from vst.models.stargan2 import (
        Discriminator,
        discriminator_params_from_torch,
    )

    params = discriminator_params_from_torch(tnet.state_dict(), img_size=64)
    net = Discriminator(img_size=64, num_domains=4)

    rng = np.random.RandomState(6)
    x = rng.randn(3, 64, 64, 3).astype(np.float32)
    y = np.array([2, 0, 1], np.int64)

    with torch.no_grad():
        want = tnet(_nchw(x), torch.from_numpy(y))
    got = net.apply({"params": params}, jnp.asarray(x), jnp.asarray(y))

    np.testing.assert_allclose(np.asarray(got), want.numpy(),
                               rtol=1e-3, atol=1e-3)
