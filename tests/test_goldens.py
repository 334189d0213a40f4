"""Golden regression tests — the reference's committed eval JSONs turned into
real tolerance-based fixtures (SURVEY §4 implication): a fully-seeded tiny
eval pipeline must reproduce the committed metric values.
"""

import json
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

GOLDEN = os.path.join(os.path.dirname(__file__), "goldens", "tiny_eval.json")


def _run_tiny_eval():
    from vst.data.synthetic import AffineMotionGenerator, _texture
    from vst.eval.sintel import SintelVideo, evaluate_videos
    from vst.models.faststyle import FastStyleNet

    rng = np.random.RandomState(0)
    gen = AffineMotionGenerator(crop_hw=(64, 96), seed=1)
    frames, _, _ = gen.generate(_texture(rng, (160, 192)), n_frames=7)
    video = SintelVideo("golden_1", frames)

    net = FastStyleNet(n_styles=3)
    params = net.init(jax.random.PRNGKey(42),
                      jnp.zeros((1, 64, 96, 3)), 1.0, 0)

    def stylize(img, sid):
        _, out = net.apply(params, img, 1.0, sid)
        return jnp.clip(out / 255.0, 0.0, 1.0)

    def raft_apply(i1, i2):
        # deterministic flow stand-in (real RAFT weights are not bundled,
        # so the golden covers the harness + warp + mask math)
        d = jnp.mean(i1 - i2, axis=-1, keepdims=True)
        return None, jnp.concatenate([3 * d, -2 * d], axis=-1)

    res = evaluate_videos([video], stylize, raft_apply, styles=[0, 1, 2],
                          dt_iters=1)
    return {
        "TCL-ST_mean": res["TCL-ST"]["TCL-ST_mean"],
        "TCL-LT_mean": res["TCL-LT"]["TCL-LT_mean"],
        "TCL-ST_golden_1_s1": res["TCL-ST"]["TCL-ST_golden_1_s1"],
        "TCL-ST_golden_1_s3": res["TCL-ST"]["TCL-ST_golden_1_s3"],
    }


@pytest.mark.slow
def test_tiny_eval_matches_golden():
    got = _run_tiny_eval()
    if not os.path.exists(GOLDEN):
        os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
        with open(GOLDEN, "w") as f:
            json.dump(got, f, indent=2)
        raise AssertionError("golden created on first run — rerun the test")
    with open(GOLDEN) as f:
        want = json.load(f)
    for k, v in want.items():
        np.testing.assert_allclose(got[k], v, rtol=2e-3, err_msg=k)


def test_checkpointer_roundtrip(tmp_path):
    from vst.core import Checkpointer
    import optax

    params = {"w": jnp.arange(6.0).reshape(2, 3), "b": jnp.zeros(3)}
    tx = optax.adam(1e-3)
    opt = tx.init(params)

    ckpt = Checkpointer(str(tmp_path))
    ckpt.save(1000, nets=params, optim=opt)
    assert ckpt.latest_step() == 1000

    like = {"w": jnp.zeros((2, 3)), "b": jnp.ones(3)}
    restored = ckpt.restore(1000, nets=like)["nets"]
    np.testing.assert_array_equal(np.asarray(restored["w"]),
                                  np.asarray(params["w"]))
    ckpt.save(2000, nets=params)
    assert ckpt.latest_step() == 2000
