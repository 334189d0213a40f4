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
