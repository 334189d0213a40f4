"""OBST — optimization-based style transfer (Gatys + temporal warm start).

TPU-native rebuild of ``methods/optimization-based/obst_eval.py:236-410``:
LBFGS descent on the image itself against a truncated caffe-VGG19's Gram
targets, coarse-to-fine over a 3-level pyramid, with a masked
temporal-consistency penalty inside the objective and warm starting from the
warped previous stylized frame.

Reference math reproduced:
* style layers r21/r31/r41 with weights β/n² (β=100, n∈{128,256,512}),
  content layer r42 weight 1 (obst_eval.py:262-274);
* objective adds ``weight_tcl·mean((mask·(opt − warp))²)`` (:391);
* pyramid iterate counts [50, 40, 30] (:241), each level bilinearly
  upsampling the previous level's result (:370-371) and re-resizing the
  content/warp/mask targets (:359-364, align_corners=False);
* warm start ``pre = mask·warp(prev_styled, bf) + (1−mask)·img`` (:500).

LBFGS under jit: ``vst.ops.lbfgs.lbfgs_minimize`` — a torch-exact
replication of ``torch.optim.LBFGS`` (no-line-search branch) inside a
``lax.scan``: same two-loop recursion with ``ys > 1e-10`` curvature gating,
same first-step ``min(1, 1/‖g‖₁)`` scaling, and the reference driver's
closure-call counting (``while n_iter <= max_iter: step(closure)``,
obst_eval.py:386-404, runs [60, 60, 40] iterations for the configured
[50, 40, 30]). One compiled program per pyramid level shape.
Round ≤3 used ``optax.scale_by_lbfgs`` (unit first step, [50, 40, 30]
iterations) — trajectories never re-converge after a different first
iterate, which blocked pipeline-level parity with the living harness.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from vst.perceptual.vgg import CaffeVGG, obst_prep
from vst.ops.losses import gram_matrix
from vst.ops.image import resize_bilinear
from vst.ops.sample import warp

STYLE_LAYERS = ("r21", "r31", "r41")
CONTENT_LAYERS = ("r42",)
STYLE_WEIGHTS = tuple(1e2 / n**2 for n in (128, 256, 512))
CONTENT_WEIGHTS = (1e0,)

PYR_FC2 = ((64, 64), (128, 128), (256, 256))
PYR_SINTEL = ((109, 256), (218, 512), (436, 1024))
MAX_ITERS = (50, 40, 30)


class OBST:
    """Owns the frozen VGG and compiled per-level LBFGS programs.

    ``vgg_params``: converted ``vgg_conv.pth`` tree (caffe_vgg_params_from
    _torch) or None for seeded init. All images are caffe-preprocessed BGR
    ×255 tensors (use ``vst.perceptual.obst_prep``).
    """

    def __init__(self, vgg_params: Optional[dict] = None,
                 max_iters: Sequence[int] = MAX_ITERS, seed: int = 0,
                 memory_size: int = 100, compute_dtype=jnp.float32):
        self.vgg = CaffeVGG(pool="max")
        if vgg_params is None:
            from vst.perceptual.vgg import he_randomized_params

            dummy = jnp.zeros((1, 64, 64, 3), jnp.float32)
            vgg_params = he_randomized_params(self.vgg.init(
                jax.random.PRNGKey(seed), dummy, list(STYLE_LAYERS)
            )["params"], seed)
        self.vgg_params = vgg_params
        # bf16 VGG closures with f32 Gram/MSE accumulation double MXU rate
        # and halve HBM traffic on the ~120 VGG fwd+bwd per frame; the image
        # itself, the LBFGS state and every loss reduction stay f32.
        self.compute_dtype = compute_dtype
        # accumulation dtype: f32 normally; f64 when the whole pipeline runs
        # double (the pipeline-parity tests do — torch's tiny first LBFGS
        # step makes the curvature pair smaller than cross-framework f32
        # noise, see vst/ops/lbfgs.py docstring)
        self.acc_dtype = (jnp.float64 if compute_dtype == jnp.float64
                          else jnp.float32)
        self._vgg_params_c = jax.tree.map(
            lambda p: jnp.asarray(p, compute_dtype), vgg_params)
        self.max_iters = tuple(max_iters)
        self.memory_size = memory_size
        self.style_targets: Optional[List[List[jnp.ndarray]]] = None
        self._level_fns = {}

    # -- style targets (obst_eval.py:324-340) -------------------------------

    def set_style(self, style_img: np.ndarray, pyr_shapes: Sequence[Tuple[int, int]]):
        """style_img: (H, W, 3) RGB [0,1]. Builds per-level Gram targets from
        the style image resized to each pyramid shape."""
        targets = []
        for shape in pyr_shapes:
            img = jnp.asarray(style_img)[None]
            img = resize_bilinear(img, shape, align_corners=False)
            x = obst_prep(img).astype(self.compute_dtype)
            feats = self.vgg.apply(
                {"params": self._vgg_params_c}, x, list(STYLE_LAYERS))
            # targets through the SAME compute path as the closure so any
            # bf16 bias cancels in (gram(f) − g_t); gram accumulates f32.
            targets.append([gram_matrix(f) for f in feats])
        self.style_targets = targets

    # -- objective -----------------------------------------------------------

    def _loss(self, opt_img, style_grams, content_feats, warp_img, mask_img,
              weight_tcl, vgg_params=None):
        feats = self.vgg.apply(
            {"params": self._vgg_params_c if vgg_params is None
             else vgg_params},
            opt_img.astype(self.compute_dtype),
            list(STYLE_LAYERS) + list(CONTENT_LAYERS),
        )
        loss = 0.0
        for w, f, g_t in zip(STYLE_WEIGHTS, feats[: len(STYLE_LAYERS)], style_grams):
            loss += w * jnp.mean((gram_matrix(f) - g_t) ** 2)
        for w, f, f_t in zip(CONTENT_WEIGHTS, feats[len(STYLE_LAYERS):], content_feats):
            loss += w * jnp.mean((f.astype(self.acc_dtype) - f_t) ** 2)
        loss += weight_tcl * jnp.mean((mask_img * (opt_img - warp_img)) ** 2)
        return loss

    def _level_fn(self, shape: Tuple[int, int], iters: int):
        """Compiled LBFGS descent at one pyramid level — torch-exact
        semantics via vst.ops.lbfgs (``iters`` is already the closure-call
        count of the reference's while-loop driver)."""
        key = (shape, iters)
        if key in self._level_fns:
            return self._level_fns[key]

        from vst.ops.lbfgs import lbfgs_minimize

        @jax.jit
        def run_p(vgg_params, opt_img, style_grams, content_feats, warp_img,
                  mask_img, weight_tcl):
            # vgg params enter as an ARGUMENT, not a closure constant:
            # closed-over weights become jit constants that XLA
            # constant-folds (e.g. reversing every (3,3,512,512) kernel for
            # the transpose conv at compile time — minutes of compile and a
            # bloated program, pathological at f64 in the parity tests)
            loss_fn = lambda x: self._loss(
                x, style_grams, content_feats, warp_img, mask_img,
                weight_tcl, vgg_params=vgg_params)
            # compact direction: mathematically the two-loop recursion but
            # two MXU matvecs instead of 2·m sequential n-dots — round 2
            # measured the sequential history dots dominating the whole
            # OBST frame (NOTES_ROUND2.md "bf16 closures only ~1% faster")
            return lbfgs_minimize(loss_fn, opt_img, num_iters=iters,
                                  impl="compact")

        def run(opt_img, style_grams, content_feats, warp_img, mask_img,
                weight_tcl):
            return run_p(self._vgg_params_c, opt_img, style_grams,
                         content_feats, warp_img, mask_img, weight_tcl)

        self._level_fns[key] = run
        return run

    # -- main entry (obst_eval.py:342-410) ------------------------------------

    def run(self, pre, img, mask, pyr_shapes: Sequence[Tuple[int, int]],
            weight_tcl: float = 0.0):
        """pre: warm-start image (1, H, W, 3) caffe space at full res;
        img: content image (same space/res); mask: (1, H, W, 1).
        Returns the stylized image at pyr_shapes[-1]."""
        assert self.style_targets is not None, "call set_style first"

        wimg = pre
        mimg = jnp.broadcast_to(mask, mask.shape[:3] + (3,))

        warp_targets, mask_targets, content_targets = [], [], []
        for shape in pyr_shapes:
            warp_targets.append(resize_bilinear(wimg, shape, align_corners=False))
            mask_targets.append(resize_bilinear(mimg, shape, align_corners=False))
            c = resize_bilinear(img, shape, align_corners=False)
            content_targets.append([
                jax.lax.stop_gradient(f.astype(self.acc_dtype))
                for f in self.vgg.apply(
                    {"params": self._vgg_params_c},
                    c.astype(self.compute_dtype), list(CONTENT_LAYERS))
            ])

        from vst.ops.lbfgs import torch_eval_counts

        opt_img = pre
        eval_counts = torch_eval_counts(self.max_iters)
        for lvl, (shape, iters) in enumerate(zip(pyr_shapes, eval_counts)):
            opt_img = resize_bilinear(opt_img, shape, align_corners=False)
            run = self._level_fn(shape, iters)
            opt_img, _ = run(
                opt_img,
                self.style_targets[lvl],
                content_targets[lvl],
                warp_targets[lvl],
                mask_targets[lvl],
                weight_tcl,
            )
        return opt_img

    def warm_start(self, prev_styled, img, bf, mask):
        """obst_eval.py:500: ``pre = mask·warp(prev_styled, bf) + (1−mask)·img``."""
        w = warp(prev_styled, bf)
        return mask * w + (1.0 - mask) * img
