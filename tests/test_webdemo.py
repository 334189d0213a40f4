"""Browser-GUI demo: endpoint drive (the L13 surface — style switch,
strength slider, resolution, snapshot — exercised over real HTTP)."""

import json
import threading
from http.server import ThreadingHTTPServer
from urllib.request import Request, urlopen

import numpy as np


def test_web_demo_endpoints(tmp_path):
    from vst.cli.webdemo import WebDemo, make_handler

    demo = WebDemo(hw=(32, 48), out_path=str(tmp_path), n_styles=2,
                   platform="cpu")
    server = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(demo))
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{port}"

    try:
        # page carries the controls
        page = urlopen(base + "/", timeout=10).read()
        assert b"vst live stylization" in page
        assert b"style 2" in page and b"snapshot" in page

        # controls: style switch + strength + resolution scale
        for payload in ({"sid": 1}, {"strength": 0.5}, {"scale": 0.5}):
            urlopen(Request(base + "/control",
                            data=json.dumps(payload).encode(),
                            method="POST"), timeout=10).read()
        st = json.loads(urlopen(base + "/state", timeout=10).read())
        assert st["sid"] == 1 and st["strength"] == 0.5 and st["scale"] == 0.5

        # run a few frames through the jitted program, then check the
        # stream + snapshot
        t = threading.Thread(target=demo.loop, kwargs={"max_frames": 4})
        t.start()
        t.join(300)
        assert not t.is_alive()
        frame = urlopen(base + "/frame.jpg", timeout=10).read()
        assert frame[:2] == b"\xff\xd8"  # JPEG SOI
        saved = json.loads(urlopen(Request(base + "/snapshot", data=b"",
                                           method="POST"),
                                   timeout=10).read())["saved"]
        data = open(saved, "rb").read()
        assert data[:2] == b"\xff\xd8"
        st = json.loads(urlopen(base + "/state", timeout=10).read())
        assert st["frames"] == 4 and st["fps"] >= 0.0
    finally:
        demo.stop()
        server.shutdown()
        server.server_close()
