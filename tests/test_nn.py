"""Parity/behavior tests for vst.nn layers."""

import numpy as np
import torch
import torch.nn as tnn
import torch.nn.functional as TF
import jax
import jax.numpy as jnp

from vst.nn.conv import ConvLayer, ConvTanh, UpsampleConvLayer
from vst.nn.norm import InstanceNorm, ConditionalInstanceNorm, AdaIN, instance_norm


def _conv_params_to_flax(conv):
    w = conv.weight.detach().numpy().transpose(2, 3, 1, 0)
    b = conv.bias.detach().numpy()
    return w, b


def test_conv_layer_matches_torch_reflection_conv():
    """ConvLayer == ReflectionPad2d(k//2) + Conv2d (network.py:97-108)."""
    torch.manual_seed(0)
    for k, stride in [(9, 1), (3, 2), (3, 1)]:
        tc = tnn.Conv2d(3, 8, k, stride=stride)
        x = np.random.RandomState(k).randn(2, 16, 20, 3).astype(np.float32)

        layer = ConvLayer(8, k, stride=stride)
        w, b = _conv_params_to_flax(tc)
        params = {"params": {"TorchConv_0": {"Conv_0": {"kernel": w, "bias": b}}}}
        got = layer.apply(params, jnp.asarray(x))

        tx = torch.from_numpy(x).permute(0, 3, 1, 2)
        want = tc(TF.pad(tx, (k // 2,) * 4, mode="reflect"))
        np.testing.assert_allclose(
            np.asarray(got), want.detach().permute(0, 2, 3, 1).numpy(),
            rtol=1e-4, atol=1e-5,
        )


def test_instance_norm_matches_torch():
    x = np.random.RandomState(1).randn(2, 8, 9, 4).astype(np.float32)
    got = instance_norm(jnp.asarray(x))
    want = TF.instance_norm(torch.from_numpy(x).permute(0, 3, 1, 2))
    np.testing.assert_allclose(
        np.asarray(got), want.permute(0, 2, 3, 1).numpy(), rtol=1e-4, atol=1e-5
    )


def test_conditional_instance_norm_styles_differ():
    model = ConditionalInstanceNorm(num_styles=3)
    x = jnp.asarray(np.random.RandomState(2).randn(2, 6, 6, 5).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), x, 0)
    y0 = model.apply(params, x, 0)
    y1 = model.apply(params, x, 1)
    assert y0.shape == x.shape
    # γ is initialized N(1, 0.02) per style, so different styles give
    # different outputs
    assert not np.allclose(np.asarray(y0), np.asarray(y1))


def test_conv_tanh_range():
    """ConvTanh output = tanh(x/255)·150 + 127.5 ∈ (−22.5, 277.5)."""
    model = ConvTanh(3, 9)
    x = jnp.asarray(np.random.RandomState(3).randn(1, 16, 16, 32).astype(np.float32) * 100)
    params = model.init(jax.random.PRNGKey(0), x)
    y = np.asarray(model.apply(params, x))
    assert y.min() > -22.5 and y.max() < 277.5


def test_upsample_conv_shape():
    model = UpsampleConvLayer(16, 3, upsample=2)
    x = jnp.zeros((1, 8, 10, 32))
    params = model.init(jax.random.PRNGKey(0), x)
    y = model.apply(params, x)
    assert y.shape == (1, 16, 20, 16)


def test_adain_matches_reference_math():
    """AdaIN: (1+γ)·IN(x) + β with (γ, β) from a linear on the style code
    (StarGANv2Adv/core/model.py:67-77)."""
    model = AdaIN(num_features=6)
    x = jnp.asarray(np.random.RandomState(4).randn(2, 5, 5, 6).astype(np.float32))
    s = jnp.asarray(np.random.RandomState(5).randn(2, 16).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), x, s)
    y = model.apply(params, x, s)

    kernel = np.asarray(params["params"]["Dense_0"]["kernel"])
    bias = np.asarray(params["params"]["Dense_0"]["bias"])
    h = np.asarray(s) @ kernel + bias
    gamma, beta = np.split(h, 2, axis=-1)
    want = (1 + gamma[:, None, None, :]) * np.asarray(instance_norm(x)) + beta[:, None, None, :]
    np.testing.assert_allclose(np.asarray(y), want, rtol=1e-4, atol=1e-5)
