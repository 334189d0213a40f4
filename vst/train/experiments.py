"""Experiment harness — parity with ``methods/learning-based/fs_tests.py``.

The reference's "tests" are thesis experiment drivers: ``train_net`` /
``infer_test`` / ``eval_test`` plus the ``param_var`` emphasis-parameter
sweep that emits LaTeX table rows (:38-49). Rebuilt here on the vst trainer
with synthetic data fallbacks so every experiment runs end-to-end in CI.
"""

from __future__ import annotations

from typing import Callable, List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from vst.train.registry import select_method, FASTSTYLE_METHODS
from vst.train.faststyle import FastStyleTrainer
from vst.data.styles import load_style_images
from vst.data.synthetic import synthetic_batch


def train_net(
    method: str,
    emphasis: Optional[Sequence[float]] = None,
    sid: int = 2,
    steps: int = 50,
    batch_size: int = 4,
    hw=(64, 64),
    style_images=None,
    batch_iter=None,
    seed: int = 0,
):
    """Train one config; returns (trainer, final state, loss history)."""
    cfg = select_method(method, batch_size=batch_size,
                        n_frames=3 if method == "ruder" else 2)
    if emphasis is not None:
        cfg.emphasis = tuple(emphasis)
    styles = style_images if style_images is not None else load_style_images(size=64)
    trainer = FastStyleTrainer(cfg, styles[sid:sid + 1], seed=seed)

    def default_batches():
        i = 0
        while True:
            yield synthetic_batch(batch_size, hw=hw, n_frames=cfg.n_frames,
                                  seed=seed + i)
            i += 1

    it = batch_iter or default_batches()
    first = {k: jnp.asarray(v) for k, v in next(it).items()}
    state = trainer.init_state(first)
    step_fn = trainer.train_step()
    rng = jax.random.PRNGKey(seed)
    losses = []
    batch = first
    for i in range(steps):
        rng, sub = jax.random.split(rng)
        state, metrics = step_fn(state, batch, 0, sub)
        losses.append({k: float(v) for k, v in metrics.items()})
        batch = {k: jnp.asarray(v) for k, v in next(it).items()}
    return trainer, state, losses


def infer_test(trainer, state, frames: np.ndarray, style_id: int = 0):
    """Per-frame inference over a clip; returns (styled frames, mean ST
    consistency, mean LT consistency) like the reference's ``infer`` timing/
    consistency summary (fast_style_transfer.py:267-390, host-warp variant)."""
    stylize = trainer.stylize_fn()
    styled = np.stack([
        np.asarray(stylize(state.params, jnp.asarray(frames[i:i + 1]), style_id))[0]
        for i in range(frames.shape[0])
    ])
    st = float(np.mean(np.abs(np.diff(styled, axis=0))))
    lt = float(np.mean(np.abs(styled[5:] - styled[:-5]))) if len(styled) > 5 else 0.0
    return styled, st, lt


def param_var(
    method: str,
    pos: int,
    values: Sequence[float],
    steps: int = 30,
    hw=(64, 64),
    seed: int = 0,
) -> Tuple[str, List]:
    """Sweep one emphasis parameter — parity with ``param_var``
    (fs_tests.py:38-49): train each variant briefly, collect consistency
    stats, emit a LaTeX row."""
    std = list(FASTSTYLE_METHODS[method])
    results = []
    for v in values:
        var = std.copy()
        var[pos] = v
        trainer, state, _ = train_net(method, var, steps=steps, hw=hw,
                                      seed=seed)
        clip = synthetic_batch(1, hw=hw, n_frames=2, seed=seed + 999)["imgs"][0]
        _, st, lt = infer_test(trainer, state, clip)
        results.append((st, lt))
    cst = np.asarray(results)
    flat = np.hstack((cst[:, 0], cst[:, 1]))
    latex = " & ".join("%.4f" % x for x in flat)
    return " & " + latex, results
