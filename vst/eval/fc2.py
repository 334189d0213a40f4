"""FC2 metric harness: per-task TCL / FID / LPIPS.

Parity with ``utils/metrics/eval.py:71-246`` (``calculate_metrics``): for
every domain pair task ``style{o}2style{t}`` (o ≠ t), generate
``num_outs_per_domain`` fakes per eval sample, compute

* TCL: per-sample RMS of ``mask·(G(x2) − warp(G(x), flow))`` with GT flow
  (:137-138) — reference ``warp`` convention (flowtools);
* LPIPS: mean pairwise distance within each sample's fake chunk (:202-210);
* FID: between each task's ref pile and fake pile (:213);

then write ``{TCL,LPIPS,FID}_{step:05d}_{mode}.json`` with
``<METRIC>_<mode>/<task>`` keys plus ``/mean`` (:223-246). Fakes are kept
in memory (the reference round-trips PNG files; same pixels modulo the 8-bit
quantization it incurs — documented deviation, quantization optional).
"""

from __future__ import annotations

import os
from collections import OrderedDict
from typing import Callable, Dict, Iterable, List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from vst.ops.sample import warp
from vst.core.metrics import save_json
from vst.metrics.fid import InceptionV3, fid_from_activations
from vst.metrics.lpips import LPIPS, lpips_pairwise


def calculate_metrics(
    style_fn: Callable,
    eval_batches: Iterable[Dict[str, np.ndarray]],
    num_domains: int,
    mode: str = "latent",
    num_outs_per_domain: int = 10,
    step: int = 0,
    out_dir: Optional[str] = None,
    inception: Optional[InceptionV3] = None,
    lpips: Optional[LPIPS] = None,
    rng_seed: int = 0,
    quantize_like_png: bool = True,
    deterministic: bool = False,
):
    """style_fn(x_real, y_trg, mode, rng, x_ref) → x_fake for the model under
    test (StarGAN-v2 closes over mapping-network/style-encoder; per-style
    models dispatch on y_trg). In ``reference`` mode the style code must come
    from ``x_ref`` (``utils/metrics/eval.py:128``), which is why the batch's
    reference pile is threaded through. Batch dict keys follow
    vst.data.fc2.BATCH_KEYS.

    ``deterministic=True`` declares that style_fn ignores ``rng`` (e.g.
    StarGAN v1 is a function of (x, y) only): every fake in a sample's
    chunk is then byte-identical and within-chunk pairwise LPIPS is 0 by
    construction, so the diversity metric is skipped and annotated rather
    than reported as a real score.
    """
    assert mode in ("latent", "reference")
    inception = inception or InceptionV3(seed=0)
    lpips = lpips or LPIPS(seed=0)

    tasks = []
    for d in range(1, num_domains):
        tasks += [f"style02style{d}", f"style{d}2style0"]

    tcl_vals: Dict[str, List[float]] = {t: [] for t in tasks}
    fakes: Dict[str, List[np.ndarray]] = {t: [] for t in tasks}
    refs: Dict[str, List[np.ndarray]] = {t: [] for t in tasks}
    # chunk boundaries: each sample contributes num_outs consecutive fakes
    chunk_ids: Dict[str, List[int]] = {t: [] for t in tasks}

    rng = jax.random.PRNGKey(rng_seed)

    @jax.jit
    def tcl_batch(x_fake, x_fake2, mask, flow):
        x_warp = warp(x_fake, flow)
        err = (mask * (x_fake2 - x_warp)) ** 2
        return jnp.sqrt(jnp.mean(err, axis=(1, 2, 3)))

    sample_counter = 0
    for batch in eval_batches:
        x_real = jnp.asarray(batch["x_src"])
        x_real2 = jnp.asarray(batch["x2_src"])
        y_org = np.asarray(batch["y_src"])
        y_trg = np.asarray(batch["y_ref"])
        mask = jnp.asarray(batch["mask"])
        flow = jnp.asarray(batch["flow"])
        x_ref = np.asarray(batch["x_ref"])
        N = x_real.shape[0]

        x_ref_dev = jnp.asarray(batch["x_ref"])
        for j in range(num_outs_per_domain):
            rng, sub = jax.random.split(rng)
            x_fake = style_fn(x_real, jnp.asarray(y_trg), mode, sub, x_ref_dev)
            x_fake2 = style_fn(x_real2, jnp.asarray(y_trg), mode, sub, x_ref_dev)
            tcl = np.asarray(tcl_batch(x_fake, x_fake2, mask, flow))
            xf = np.asarray(x_fake)
            if quantize_like_png:
                # the reference writes fakes as 8-bit PNGs before FID/LPIPS
                xf01 = np.clip((xf + 1) / 2, 0, 1)
                xf = (np.round(xf01 * 255) / 255 * 2 - 1).astype(np.float32)

            for k in range(N):
                if y_org[k] == y_trg[k]:
                    continue
                task = f"style{y_org[k]}2style{y_trg[k]}"
                if task not in tcl_vals:
                    continue
                tcl_vals[task].append(float(tcl[k]))
                fakes[task].append(xf[k])
                chunk_ids[task].append(sample_counter + k)
                if j == 0:
                    refs[task].append(x_ref[k])
        sample_counter += N

    tcl_dict, lpips_dict, fid_dict = OrderedDict(), OrderedDict(), OrderedDict()
    for task in tasks:
        if not fakes[task]:
            continue
        tcl_dict[f"TCL_{mode}/{task}"] = float(np.mean(tcl_vals[task]))

        if not deterministic:
            # group fakes by sample → chunks of num_outs_per_domain
            by_sample: Dict[int, List[np.ndarray]] = {}
            for img, sid in zip(fakes[task], chunk_ids[task]):
                by_sample.setdefault(sid, []).append(img)
            lp_vals = [
                lpips_pairwise(lpips, [im[None] for im in group])
                for group in by_sample.values()
                if len(group) > 1
            ]
            if lp_vals:
                lpips_dict[f"LPIPS_{mode}/{task}"] = float(np.mean(lp_vals))

        ref_act = inception(jnp.asarray(np.stack(refs[task])))
        fake_act = inception(jnp.asarray(np.stack(fakes[task])))
        fid_dict[f"FID_{mode}/{task}"] = fid_from_activations(ref_act, fake_act)

    if deterministic:
        lpips_dict[f"LPIPS_{mode}/note"] = (
            "skipped: generator is deterministic in (x, y) — every fake in "
            "a sample's chunk is identical, so within-chunk pairwise LPIPS "
            "is degenerate-by-construction (no diversity to measure)")
    backbones = {"LPIPS": getattr(lpips, "backbone", "random-he"),
                 "FID": getattr(inception, "backbone", "random-he")}
    for d, name in ((lpips_dict, "LPIPS"), (fid_dict, "FID"), (tcl_dict, "TCL")):
        nums = [v for k, v in d.items()
                if not k.endswith("/mean") and isinstance(v, float)]
        if nums:
            d[f"{name}_{mode}/mean"] = float(np.mean(nums))
            if name in backbones:
                # label metric-net provenance: "random-he" numbers are a
                # pipeline test, not comparable to reference magnitudes
                d[f"{name}_{mode}/backbone"] = backbones[name]
        if out_dir:
            save_json(d, os.path.join(out_dir, f"{name}_{step:05d}_{mode}.json"),
                      aggregate=False)

    return {"TCL": tcl_dict, "LPIPS": lpips_dict, "FID": fid_dict}
