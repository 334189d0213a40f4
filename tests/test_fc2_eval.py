"""FC2 loader + metric harness end-to-end on synthetic data."""

import os
import tempfile

import numpy as np
import jax
import jax.numpy as jnp

from vst.data.fc2 import synthetic_fc2_batches, train_eval_split, FC2Fetcher
from vst.eval.fc2 import calculate_metrics
from vst.metrics.fid import InceptionV3
from vst.metrics.lpips import LPIPS
import pytest


def test_train_eval_split():
    tr, ev = train_eval_split(1000, 0.97, seed=0)
    assert len(tr) == 970 and len(ev) == 30
    assert set(tr).isdisjoint(set(ev))


def test_synthetic_fc2_batch_keys():
    batches = synthetic_fc2_batches(2, 3, hw=(32, 32), num_dom=4, seed=0)
    b = batches[0]
    assert b["x_src"].shape == (3, 32, 32, 3)
    assert b["mask"].shape == (3, 32, 32, 1)
    assert b["flow"].shape == (3, 32, 32, 2)
    assert b["x_src"].min() >= -1 and b["x_src"].max() <= 1


@pytest.mark.slow
def test_calculate_metrics_end_to_end(tmp_path):
    batches = synthetic_fc2_batches(2, 4, hw=(96, 96), num_dom=3, seed=1)

    def style_fn(x, y, mode, rng, x_ref):
        # fake generator: per-domain channel shift + style noise keyed on rng
        shift = (y[:, None, None, None].astype(jnp.float32) - 1.0) * 0.1
        noise = 0.02 * jax.random.normal(rng, x.shape)
        return jnp.clip(x + shift + noise, -1, 1)

    results = calculate_metrics(
        style_fn, batches, num_domains=3, mode="latent",
        num_outs_per_domain=3, step=7, out_dir=str(tmp_path),
        inception=InceptionV3(seed=0), lpips=LPIPS(seed=0),
    )
    assert "TCL_latent/mean" in results["TCL"]
    assert "FID_latent/mean" in results["FID"]
    assert "LPIPS_latent/mean" in results["LPIPS"]
    for v in results["TCL"].values():
        assert np.isfinite(v)
    # files written with the reference naming
    assert (tmp_path / "TCL_00007_latent.json").exists()
    assert (tmp_path / "FID_00007_latent.json").exists()
    assert (tmp_path / "LPIPS_00007_latent.json").exists()
    # LPIPS over identical-but-for-noise outputs is small but > 0
    lp = [v for k, v in results["LPIPS"].items()
          if not k.endswith(("/mean", "/backbone"))]
    assert all(v > 0 for v in lp)
    # provenance label: random-backbone numbers must be marked as such
    assert results["LPIPS"]["LPIPS_latent/backbone"] == "random-he"
    assert results["FID"]["FID_latent/backbone"] == "random-he"


@pytest.mark.slow
def test_evaluate_fc2_obst():
    from vst.eval.drivers import evaluate_fc2_obst
    from vst.models.gatys import OBST
    from vst.data.styles import load_style_images

    batches = synthetic_fc2_batches(1, 3, hw=(96, 96), num_dom=3, seed=4)
    # OBST pipeline expects [0,1] images
    for b in batches:
        for k in ("x_src", "x2_src", "x_ref"):
            b[k] = (b[k] + 1) / 2

    obst = OBST(max_iters=(2, 2), seed=0)
    styles = load_style_images(size=48)
    res = evaluate_fc2_obst(
        obst, batches, styles, pyr_shapes=((48, 48), (96, 96)),
        num_domains=3, inception=InceptionV3(seed=0),
    )
    assert "TCL/mean" in res["TCL"] or not res["TCL"]
    for v in res["TCL"].values():
        assert np.isfinite(v)
