"""Video assembly + SG2 debug utilities.

* ``make_videos`` — parity with ``utils/video_maker.py:24-43``: assemble
  ``eval_sintel``-style frame directories into one .mp4 per video×style at
  18 fps.
* ``image_grid`` / ``translate_and_reconstruct`` — SG2 debug grids
  (``StarGANv2Adv/core/utils.py:63-148``): rows of [src, ref, fake, rec].
* ``latent_interpolation_video`` — ``video_latent`` (:200-275): stylize one
  frame while lerping between latent style codes, write an mp4.
"""

from __future__ import annotations

import os
from typing import Callable, List, Optional, Sequence

import numpy as np


def _writer(path: str, fps: int):
    """mp4 via imageio/ffmpeg when a backend exists; otherwise fall back to
    GIF (this environment ships no ffmpeg — gated, not stubbed)."""
    import imageio.v2 as imageio

    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    try:
        return path, imageio.get_writer(path, fps=fps)
    except (ValueError, ImportError):
        gif = os.path.splitext(path)[0] + ".gif"
        return gif, imageio.get_writer(gif, duration=1000.0 / fps)


def make_videos(frames_root: str, out_dir: Optional[str] = None,
                fps: int = 18) -> List[str]:
    """Every subdirectory of ``frames_root`` containing PNGs becomes
    ``<out_dir>/<subdir>.mp4``."""
    import imageio.v2 as imageio

    out_dir = out_dir or frames_root
    written = []
    for sub in sorted(os.listdir(frames_root)):
        d = os.path.join(frames_root, sub)
        if not os.path.isdir(d):
            continue
        frames = [f for f in sorted(os.listdir(d)) if f.endswith(".png")]
        if not frames:
            continue
        path, w = _writer(os.path.join(out_dir, sub + ".mp4"), fps)
        with w:
            for f in frames:
                w.append_data(imageio.imread(os.path.join(d, f)))
        written.append(path)
    return written


def denormalize(x: np.ndarray) -> np.ndarray:
    """[−1,1] → [0,1] clipped (core/utils.py:28-31)."""
    return np.clip((x + 1.0) / 2.0, 0.0, 1.0)


def image_grid(rows: Sequence[Sequence[np.ndarray]]) -> np.ndarray:
    """Stack images: rows of equally-sized (H, W, 3) images → one array."""
    return np.concatenate(
        [np.concatenate(list(r), axis=1) for r in rows], axis=0
    )


def translate_and_reconstruct(
    generate: Callable, style_encode: Callable,
    x_src: np.ndarray, y_src, x_ref: np.ndarray, y_ref,
    filename: Optional[str] = None,
):
    """core/utils.py:63-90: fake = G(x_src, E(x_ref, y_ref)); rec =
    G(fake, E(x_src, y_src)); grid rows = [src, ref, fake, rec]."""
    import jax.numpy as jnp

    s_ref = style_encode(jnp.asarray(x_ref), y_ref)
    x_fake = np.asarray(generate(jnp.asarray(x_src), s_ref))
    s_src = style_encode(jnp.asarray(x_src), y_src)
    x_rec = np.asarray(generate(jnp.asarray(x_fake), s_src))
    # one row per quantity; batch entries side by side within a row
    rows = [
        [denormalize(img) for img in np.asarray(batch)]
        for batch in (x_src, x_ref, x_fake, x_rec)
    ]
    grid = image_grid(rows)
    if filename:
        import imageio.v2 as imageio

        os.makedirs(os.path.dirname(os.path.abspath(filename)), exist_ok=True)
        imageio.imwrite(filename, (grid * 255).astype(np.uint8))
    return grid


def latent_interpolation_video(
    generate: Callable, mapping: Callable,
    x_src: np.ndarray, latents: np.ndarray, y_trg,
    path: str, steps_per_pair: int = 16, fps: int = 18,
):
    """video_latent parity: lerp z codes pairwise, stylize, write mp4."""
    import jax.numpy as jnp

    path, w = _writer(path, fps)
    with w:
        for a, b in zip(latents[:-1], latents[1:]):
            for t in np.linspace(0.0, 1.0, steps_per_pair, endpoint=False):
                z = (1 - t) * a + t * b
                s = mapping(jnp.asarray(z[None]), y_trg)
                frame = np.asarray(generate(jnp.asarray(x_src[None]), s))[0]
                w.append_data((denormalize(frame) * 255).astype(np.uint8))
    return path
