"""FastStyleNet shape / gating / multi-style behavior tests."""

import pytest
import numpy as np
import jax
import jax.numpy as jnp

from vst.models.faststyle import FastStyleNet, ResidualBlock


@pytest.mark.slow
def test_faststyle_shapes_single_style():
    model = FastStyleNet(n_styles=1)
    x = jnp.zeros((1, 64, 96, 3))
    params = model.init(jax.random.PRNGKey(0), x)
    features, out = model.apply(params, x)
    assert features.shape == (1, 16, 24, 128)
    assert out.shape == (1, 64, 96, 3)


@pytest.mark.slow
def test_faststyle_ruder_input_channels():
    """Ruder variant: 7-channel input (frame ⊕ mask ⊕ warped prev styled)."""
    model = FastStyleNet(num_inp=7, n_styles=1)
    x = jnp.zeros((1, 32, 32, 7))
    params = model.init(jax.random.PRNGKey(0), x)
    _, out = model.apply(params, x)
    assert out.shape == (1, 32, 32, 3)


def test_faststyle_multistyle_outputs_differ():
    model = FastStyleNet(n_styles=3)
    x = jnp.asarray(np.random.RandomState(0).rand(1, 32, 32, 3).astype(np.float32) * 255)
    params = model.init(jax.random.PRNGKey(1), x, 1.0, 0)
    _, y0 = model.apply(params, x, 1.0, 0)
    _, y1 = model.apply(params, x, 1.0, 2)
    assert not np.allclose(np.asarray(y0), np.asarray(y1), atol=1e-3)


def test_residual_strength_zero_is_identity():
    """style_strength=0 → gate 2·0/(1+0)=0 → block is the identity
    (network.py:243-261)."""
    block = ResidualBlock(8)
    x = jnp.asarray(np.random.RandomState(1).randn(1, 8, 8, 8).astype(np.float32))
    params = block.init(jax.random.PRNGKey(0), x, 1.0)
    y = block.apply(params, x, 0.0)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), rtol=1e-5, atol=1e-6)


def test_residual_strength_gate_saturates():
    """layer_strength=1, style_strength=1 → gate = 2·1/(1+1) = 1."""
    block = ResidualBlock(4)
    x = jnp.asarray(np.random.RandomState(2).randn(1, 6, 6, 4).astype(np.float32))
    params = block.init(jax.random.PRNGKey(0), x, 1.0)
    y_full = block.apply(params, x, 1.0)
    # manually compute: out = conv path with gate exactly 1
    # (indirect check: y_full - x equals the conv path)
    y_half = block.apply(params, x, 1.0 / 3.0)  # gate = 2/3 / (5/3) = 0.5
    path_full = np.asarray(y_full) - np.asarray(x)
    path_half = np.asarray(y_half) - np.asarray(x)
    np.testing.assert_allclose(path_half, 0.5 * path_full, rtol=1e-4, atol=1e-5)
