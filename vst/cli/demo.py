"""Live stylization demo — capability parity with the PyQt5 GUI
(``methods/learning-based/fs_gui.py:21-312``): source picker (webcam /
video file / synthetic clip), style switching, runtime style-strength and
resolution control, live FPS readout.

This environment is headless and ships no Qt, so the interactive surface is
OpenCV's HighGUI when a display exists (``--show``) and an output video
otherwise — same controls, keyboard-driven:
  0-9 style id · +/- style strength · [/] resolution scale · q quit
"""

from __future__ import annotations

import time
from typing import Optional

import numpy as np


def run_demo(
    source: Optional[str] = None,
    ckpt_dir: Optional[str] = None,
    method: str = "huang",
    n_styles: int = 3,
    n_frames: int = 60,
    hw=(128, 192),
    out_path: str = "demo_out",
    show: bool = False,
    platform: Optional[str] = None,
    seed: int = 0,
):
    if platform:
        import jax

        jax.config.update("jax_platforms", platform)
    import jax
    import jax.numpy as jnp
    import cv2

    from vst.train.registry import select_method
    from vst.train.faststyle import FastStyleTrainer
    from vst.data.styles import load_style_images
    from vst.data.synthetic import synthetic_batch

    cfg = select_method(method if method != "ruder" else "huang",
                        n_styles=n_styles)
    styles = load_style_images(size=64)[:n_styles]
    trainer = FastStyleTrainer(cfg, styles, seed=seed)
    sample = {k: jnp.asarray(v) for k, v in
              synthetic_batch(1, hw=hw, n_frames=2, seed=seed).items()}
    state = trainer.init_state(sample)
    params = state.params
    if ckpt_dir:
        from vst.core import Checkpointer

        ckpt = Checkpointer(ckpt_dir)
        step = ckpt.latest_step()
        if step is not None:
            params = ckpt.restore(step, params=params)["params"]

    model = trainer.model

    def stylize(img, strength, sid):
        _, out = model.apply({"params": params}, img, strength, sid)
        return jnp.clip(out / 255.0, 0.0, 1.0)

    stylize = jax.jit(stylize)

    # frame source
    cap = None
    if source is not None:
        cap = cv2.VideoCapture(0 if source == "webcam" else source)
        if not cap.isOpened():
            print(f"could not open source {source!r}; using synthetic clip")
            cap = None
    if cap is None:
        from vst.data.synthetic import AffineMotionGenerator, _texture

        rng = np.random.RandomState(seed)
        gen = AffineMotionGenerator(crop_hw=hw, seed=seed)
        frames, _, _ = gen.generate(
            _texture(rng, (hw[0] + 96, hw[1] + 96)), n_frames=n_frames
        )

        def reader():
            i = 0
            while i < len(frames):
                yield frames[i]
                i += 1
    else:
        def reader():
            for _ in range(n_frames):
                ok, bgr = cap.read()
                if not ok:
                    break
                rgb = cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB)
                rgb = cv2.resize(rgb, (hw[1], hw[0]))
                yield rgb.astype(np.float32) / 255.0

    from vst.eval.video import _writer

    out_file, writer = _writer(out_path + ".mp4", fps=18)
    sid, strength, scale = 0, 1.0, 1.0
    t_last, fps = time.perf_counter(), 0.0
    with writer:
        for frame in reader():
            h = int(hw[0] * scale) // 4 * 4
            w = int(hw[1] * scale) // 4 * 4
            f = cv2.resize(frame, (w, h)).astype(np.float32)
            out = np.asarray(stylize(jnp.asarray(f[None]), strength, sid))[0]
            now = time.perf_counter()
            fps = 0.9 * fps + 0.1 / max(now - t_last, 1e-6)
            t_last = now
            vis = (np.clip(out, 0, 1) * 255).astype(np.uint8)
            writer.append_data(vis)
            if show:
                cv2.putText(vis, f"s{sid} x{strength:.1f} {fps:.0f}fps",
                            (4, 14), cv2.FONT_HERSHEY_SIMPLEX, 0.4,
                            (255, 255, 255))
                cv2.imshow("vst demo", cv2.cvtColor(vis, cv2.COLOR_RGB2BGR))
                key = cv2.waitKey(1) & 0xFF
                if key == ord("q"):
                    break
                if ord("0") <= key <= ord("9"):
                    sid = min(int(chr(key)), n_styles - 1)
                if key == ord("+"):
                    strength = min(strength + 0.1, 3.0)
                if key == ord("-"):
                    strength = max(strength - 0.1, 0.0)
                if key == ord("]"):
                    scale = min(scale * 1.25, 4.0)
                if key == ord("["):
                    scale = max(scale / 1.25, 0.25)
    if cap is not None:
        cap.release()
    if show:
        cv2.destroyAllWindows()
    print(f"demo wrote {out_file} ({fps:.1f} fps)")
    return out_file
