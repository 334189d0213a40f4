"""FAN (wing) shape/pipeline tests — w_hpf>0 path completeness."""

import numpy as np
import jax
import jax.numpy as jnp

from vst.models.wing import FAN, get_heatmap, preprocess_heatmaps
import pytest


@pytest.mark.slow
def test_fan_forward_shapes():
    fan = FAN()
    x = jnp.zeros((1, 256, 256, 3))
    params = fan.init(jax.random.PRNGKey(0), x)["params"]
    heat, boundary = fan.apply({"params": params}, x)
    assert heat.shape == (1, 64, 64, 99)
    assert boundary.shape == (1, 64, 64, 2)


@pytest.mark.slow
def test_get_heatmap_masks():
    fan = FAN()
    x = jnp.asarray(
        np.random.RandomState(0).rand(1, 128, 128, 3).astype(np.float32) * 2 - 1
    )
    params = fan.init(jax.random.PRNGKey(0), jnp.zeros((1, 256, 256, 3)))["params"]
    m1, m2 = get_heatmap(fan, params, x)
    assert m1.shape == (1, 256, 256, 1) and m2.shape == (1, 256, 256, 1)
    assert np.isfinite(np.asarray(m1)).all()


def test_preprocess_pipeline_bounds():
    hm = jnp.asarray(
        np.random.RandomState(1).rand(2, 64, 64, 98).astype(np.float32)
    )
    m1, m2 = preprocess_heatmaps(hm)
    assert np.isfinite(np.asarray(m1)).all() and np.isfinite(np.asarray(m2)).all()
    # mask2 drops strictly more channels → smaller sum
    assert float(m2.sum()) <= float(m1.sum())


@pytest.mark.slow
def test_stargan2_generator_with_hpf_masks():
    """w_hpf > 0 path: encoder caches + HighPass-masked skip connections
    (model.py:168-183) — wired with FAN-style masks."""
    from vst.models.stargan2 import Generator

    g = Generator(img_size=64, style_dim=8, max_conv_dim=32, w_hpf=1)
    x = jnp.zeros((1, 64, 64, 3))
    s = jnp.zeros((1, 8))
    masks = [jnp.ones((1, 32, 32, 1)), jnp.ones((1, 64, 64, 1))]
    params = g.init(jax.random.PRNGKey(0), x, s, masks)
    y = g.apply(params, x, s, masks)
    assert y.shape == (1, 64, 64, 3)
    assert np.isfinite(np.asarray(y)).all()
