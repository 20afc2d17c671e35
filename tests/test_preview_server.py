"""Live preview server (utils.preview_server) — the reference's per-frame
canvas display (program-raymarch.ts:317-318) as a localhost HTTP stream."""

import json
import urllib.request

import numpy as np


def test_preview_server_serves_updates():
    from pathtracer_tpu.utils.preview_server import PreviewServer

    srv = PreviewServer(port=0)  # ephemeral port
    try:
        base = f"http://127.0.0.1:{srv.port}"
        # Before any update: page served, image 404.
        page = urllib.request.urlopen(f"{base}/").read()
        assert b"latest.png" in page
        try:
            urllib.request.urlopen(f"{base}/latest.png")
            assert False, "expected 404 before first update"
        except urllib.error.HTTPError as e:
            assert e.code == 404

        img = np.zeros((8, 8, 3), np.uint8)
        img[..., 0] = 200
        srv.update(img, spp_done=3, spp_total=16)
        png = urllib.request.urlopen(f"{base}/latest.png").read()
        assert png[:8] == b"\x89PNG\r\n\x1a\n"
        status = json.loads(urllib.request.urlopen(f"{base}/status").read())
        assert status == {
            "spp_done": 3, "spp_total": 16, "width": 8, "height": 8,
            "done": False,
        }

        srv.update(img, spp_done=16, spp_total=16, done=True)
        status = json.loads(urllib.request.urlopen(f"{base}/status").read())
        assert status["done"] is True
    finally:
        srv.close()
