"""Browser GUI demo — full capability parity with the reference PyQt5 app
(``methods/learning-based/fs_gui.py:21-312``): style buttons, a 0–2
style-strength slider, resolution selection, input-source picker
(synthetic clip / video file / webcam index), snapshot capture + save,
and a live FPS readout.

This image ships no Qt and is headless, so the widget toolkit is the
browser: a stdlib ``http.server`` serves one HTML page whose controls
POST to ``/control`` while an ``<img>`` polls ``/frame.jpg``. The
stylization loop runs in a background thread with ONE warm jitted
program per resolution (a resolution change recompiles once, like the
reference re-allocating its torch buffers on size change,
``fs_gui.py:98-117``).
"""

from __future__ import annotations

import io
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

import numpy as np

_PAGE = """<!doctype html>
<html><head><title>vst demo</title><style>
body {{ font-family: sans-serif; margin: 1.2em; background: #14141a; color: #eee; }}
#frame {{ border: 1px solid #444; max-width: 90vw; }}
.row {{ margin: 0.6em 0; }}
button {{ margin-right: 0.4em; }}
#fps {{ color: #8c8; }}
</style></head><body>
<h3>vst live stylization</h3>
<img id="frame" src="/frame.jpg">
<div class="row">style:
{style_buttons}
  <button onclick="ctl({{sid: -1}})">off</button>
</div>
<div class="row">strength <input id="strength" type="range" min="0" max="2"
  step="0.05" value="1.0" oninput="ctl({{strength: +this.value}})">
  <span id="sv">1.0</span></div>
<div class="row">resolution <select id="res" onchange="ctl({{scale: +this.value}})">
  <option value="1.0">full</option><option value="0.5">half</option>
  <option value="0.25">quarter</option></select>
  &nbsp; source <select id="src" onchange="ctl({{source: this.value}})">
  <option value="synthetic">synthetic</option></select>
  &nbsp; <button onclick="fetch('/snapshot', {{method: 'POST'}})">snapshot</button>
  <span id="fps"></span></div>
<script>
function ctl(d) {{ fetch('/control', {{method: 'POST', body: JSON.stringify(d)}});
  if ('strength' in d) document.getElementById('sv').textContent = d.strength.toFixed(2); }}
setInterval(() => {{
  document.getElementById('frame').src = '/frame.jpg?' + Date.now();
  fetch('/state').then(r => r.json()).then(s => {{
    document.getElementById('fps').textContent = s.fps.toFixed(1) + ' fps'; }});
}}, 100);
</script></body></html>"""


class WebDemo:
    """Stylization state machine behind the HTTP handlers."""

    def __init__(self, method: str = "huang", n_styles: int = 3,
                 ckpt_dir: Optional[str] = None, source: Optional[str] = None,
                 hw=(128, 192), out_path: str = "demo_out", seed: int = 0,
                 platform: Optional[str] = None):
        if platform:
            import jax

            jax.config.update("jax_platforms", platform)
        import jax
        import jax.numpy as jnp

        from vst.data.styles import load_style_images
        from vst.data.synthetic import synthetic_batch
        from vst.train.faststyle import FastStyleTrainer
        from vst.train.registry import select_method

        self._jax, self._jnp = jax, jnp
        self.n_styles = n_styles
        self.out_path = out_path
        cfg = select_method(method if method != "ruder" else "huang",
                            n_styles=n_styles)
        styles = load_style_images(size=64)[:n_styles]
        trainer = FastStyleTrainer(cfg, styles, seed=seed)
        sample = {k: jnp.asarray(v) for k, v in
                  synthetic_batch(1, hw=hw, n_frames=2, seed=seed).items()}
        params = trainer.init_state(sample).params
        if ckpt_dir:
            from vst.core import Checkpointer

            ckpt = Checkpointer(ckpt_dir)
            step = ckpt.latest_step()
            if step is not None:
                params = ckpt.restore(step, params=params)["params"]
        self._model, self._params = trainer.model, params

        # frame source: synthetic rigid-motion clip by default; a path or
        # webcam index goes through cv2.VideoCapture like fs_gui.py:82-97
        self.base_hw = hw
        if source is None or source == "synthetic":
            from vst.data.synthetic import AffineMotionGenerator, _texture

            rng = np.random.RandomState(seed)
            gen = AffineMotionGenerator(crop_hw=hw, seed=seed + 1)
            frames, _, _ = gen.generate(
                _texture(rng, (hw[0] + 96, hw[1] + 96)), n_frames=48)
            self._clip = frames  # [0,1] float
            self._cap = None
        else:
            import cv2

            self._cap = cv2.VideoCapture(
                int(source) if source.isdigit() else source)
            self._clip = None

        self.lock = threading.Lock()
        self.sid = 0
        self.strength = 1.0
        self.scale = 1.0
        self.fps = 0.0
        self.frames_done = 0
        self._jpeg = b""
        self._progs = {}
        self._stop = threading.Event()

    def _prog(self, hw):
        """One warm jitted program per (H, W)."""
        if hw not in self._progs:
            jax, jnp = self._jax, self._jnp

            @jax.jit
            def stylize(img, strength, sid):
                _, out = self._model.apply(
                    {"params": self._params}, img, strength, sid)
                return jnp.clip(out / 255.0, 0.0, 1.0)

            self._progs[hw] = stylize
        return self._progs[hw]

    def _next_frame(self):
        if self._clip is not None:
            f = self._clip[self.frames_done % len(self._clip)]
            return np.asarray(f, np.float32)
        ok, bgr = self._cap.read()
        if not ok:
            self._cap.set(1, 0)  # CAP_PROP_POS_FRAMES — loop files
            ok, bgr = self._cap.read()
            if not ok:
                return None
        return bgr[..., ::-1].astype(np.float32) / 255.0

    def _encode(self, img01: np.ndarray) -> bytes:
        from PIL import Image

        buf = io.BytesIO()
        Image.fromarray(
            (np.clip(img01, 0, 1) * 255).astype(np.uint8)).save(
            buf, format="JPEG", quality=85)
        return buf.getvalue()

    def loop(self, max_frames: Optional[int] = None):
        jnp = self._jnp
        t_last = time.perf_counter()
        while not self._stop.is_set():
            if max_frames is not None and self.frames_done >= max_frames:
                break
            frame = self._next_frame()
            if frame is None:
                break
            with self.lock:
                sid, strength, scale = self.sid, self.strength, self.scale
            h = max(int(frame.shape[0] * scale) // 4 * 4, 16)
            w = max(int(frame.shape[1] * scale) // 4 * 4, 16)
            if (h, w) != frame.shape[:2]:
                import cv2

                frame = cv2.resize(frame, (w, h),
                                   interpolation=cv2.INTER_LINEAR)
            if sid >= 0:
                x = jnp.asarray(frame[None])
                y = self._prog((h, w))(
                    x, jnp.asarray(float(strength)), jnp.asarray(int(sid)))
                out = np.asarray(y)[0]
            else:
                out = frame
            jpeg = self._encode(out)
            now = time.perf_counter()
            with self.lock:
                self._jpeg = jpeg
                self.fps = 0.9 * self.fps + 0.1 / max(now - t_last, 1e-6)
                self.frames_done += 1
            t_last = now

    def snapshot(self) -> str:
        import os

        os.makedirs(self.out_path, exist_ok=True)
        path = f"{self.out_path}/snapshot_{self.frames_done:05d}.jpg"
        with self.lock:
            data = self._jpeg
        with open(path, "wb") as f:
            f.write(data)
        return path

    def stop(self):
        self._stop.set()


def make_handler(demo: WebDemo):
    style_buttons = "".join(
        f'<button onclick="ctl({{sid: {i}}})">style {i + 1}</button>'
        for i in range(demo.n_styles))
    page = _PAGE.format(style_buttons=style_buttons).encode()

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _send(self, code, body, ctype):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Cache-Control", "no-store")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path.startswith("/frame.jpg"):
                with demo.lock:
                    data = demo._jpeg
                self._send(200 if data else 404, data or b"no frame yet",
                           "image/jpeg" if data else "text/plain")
            elif self.path.startswith("/state"):
                with demo.lock:
                    st = {"sid": demo.sid, "strength": demo.strength,
                          "scale": demo.scale, "fps": demo.fps,
                          "frames": demo.frames_done}
                self._send(200, json.dumps(st).encode(), "application/json")
            else:
                self._send(200, page, "text/html")

        def do_POST(self):
            n = int(self.headers.get("Content-Length") or 0)
            body = self.rfile.read(n) if n else b"{}"
            if self.path.startswith("/snapshot"):
                path = demo.snapshot()
                self._send(200, json.dumps({"saved": path}).encode(),
                           "application/json")
                return
            try:
                d = json.loads(body or b"{}")
            except ValueError:
                self._send(400, b"bad json", "text/plain")
                return
            with demo.lock:
                if "sid" in d:
                    demo.sid = int(d["sid"])
                if "strength" in d:
                    demo.strength = float(d["strength"])
                if "scale" in d:
                    demo.scale = float(d["scale"])
            self._send(200, b"{}", "application/json")

    return Handler


def run_web_demo(port: int = 8600, max_frames: Optional[int] = None,
                 **kw) -> None:
    demo = WebDemo(**kw)
    server = ThreadingHTTPServer(("127.0.0.1", port), make_handler(demo))
    st = threading.Thread(target=server.serve_forever, daemon=True)
    st.start()
    print(f"vst demo on http://127.0.0.1:{port}", flush=True)
    try:
        demo.loop(max_frames=max_frames)  # blocks until stop/max_frames
    except KeyboardInterrupt:
        pass
    finally:
        demo.stop()
        server.shutdown()
        server.server_close()
