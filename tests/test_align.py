"""FaceAligner geometry — parity with the living reference wing.py
(StarGANv2Adv/core/wing.py:325-436) on random landmark sets."""

import sys

import numpy as np
import pytest

from vst.models.align import (
    FaceAligner,
    get_preds_from_heatmaps,
    landmarks2mat,
    landmarks2xaxis,
    landmarks2S,
    points2T,
    vecs2R,
    synthetic_reference_landmarks,
)

REF = "/root/reference/methods/GAN-based/StarGANv2Adv"


def _ref_wing():
    """Exec ONLY the numpy geometry slice of the reference file (importing
    the module pulls torch + munch; the geometry needs just numpy)."""
    import types

    src = open(REF + "/core/wing.py").read()
    start = src.index("def points2T")
    end = src.index("def pad_mirror")
    ns = {"np": np}
    exec(compile(src[start:end], "ref_wing_geometry", "exec"), ns)
    return types.SimpleNamespace(**ns)


def _random_landmarks(seed):
    rng = np.random.RandomState(seed)
    lm = synthetic_reference_landmarks(256).copy()
    lm += rng.randn(*lm.shape).astype(np.float32) * 4
    # global similarity perturbation
    ang = rng.uniform(-0.4, 0.4)
    sc = rng.uniform(0.8, 1.25)
    R = np.array([[np.cos(ang), -np.sin(ang)], [np.sin(ang), np.cos(ang)]])
    return (lm - 128) @ R.T * sc + 128 + rng.uniform(-20, 20, size=(1, 2))


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_geometry_matches_reference(seed):
    w = _ref_wing()
    lm = _random_landmarks(seed).astype(np.float32)
    ref = synthetic_reference_landmarks(256)

    np.testing.assert_allclose(points2T(lm, "from"), w.points2T(lm, "from"),
                               rtol=1e-5)
    np.testing.assert_allclose(landmarks2xaxis(lm), w.landmarks2xaxis(lm),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(landmarks2S(lm, ref), w.landmarks2S(lm, ref),
                               rtol=1e-4)
    got = landmarks2mat(lm, ref)
    want = np.dot(w.points2T(ref, 'to'),
                  np.dot(w.landmarks2S(lm, ref),
                         np.dot(w.vecs2R(w.landmarks2xaxis(lm),
                                         w.landmarks2xaxis(ref)),
                                w.points2T(lm, 'from'))))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_vecs2R_rotates_x_onto_y():
    vx = np.array([1.0, 0.3]); vy = np.array([0.2, 1.0])
    R = vecs2R(vx, vy)
    out = R[:2, :2] @ (vx / np.linalg.norm(vx))
    np.testing.assert_allclose(out, vy / np.linalg.norm(vy), atol=1e-6)


def test_preds_from_heatmaps_subpixel():
    hm = np.zeros((1, 2, 64, 64), np.float32)
    hm[0, 0, 20, 30] = 1.0
    hm[0, 0, 20, 31] = 0.5  # pulls +0.25 in x
    hm[0, 1, 5, 5] = 1.0
    p = get_preds_from_heatmaps(hm)
    np.testing.assert_allclose(p[0, 0], [30 + 0.25 + 0.5, 20 + 0.5 - 0.25],
                               atol=0.5)
    np.testing.assert_allclose(p[0, 1], [5.5, 5.5], atol=0.3)


def test_align_identity_when_landmarks_match_template():
    """If FAN predicts exactly the template landmarks, the transform is
    (up to the pad_mirror offset) the identity — aligned output stays
    close to the input in the face region."""
    mat = landmarks2mat(synthetic_reference_landmarks(256),
                        synthetic_reference_landmarks(256))
    np.testing.assert_allclose(mat, np.eye(3), atol=1e-3)


@pytest.mark.slow
def test_face_aligner_end_to_end_smoke():
    import jax
    from vst.models.wing import FAN

    fan = FAN()
    import jax.numpy as jnp

    # FAN always runs at 256² (get_heatmap resizes first) — init there
    x = jnp.zeros((1, 256, 256, 3))
    params = fan.init(jax.random.PRNGKey(0), x * 0.5 + 0.5)["params"]
    aligner = FaceAligner(fan, params, output_size=64)
    rng = np.random.RandomState(0)
    imgs = rng.rand(1, 64, 64, 3).astype(np.float32) * 2 - 1
    out = aligner.align(imgs)
    assert out.shape == imgs.shape
    assert np.isfinite(out).all()
    assert out.min() >= -1.001 and out.max() <= 1.001
