"""Interactive local viewer — the TPU-era equivalent of the reference's
Vulkan/ImGui viewer (src/vk-renderer/, renderer_t; controls at
src/volumetric-ray-tracer/main.cpp:228-242).

Instead of a swapchain + staging buffers, a small local HTTP server renders
frames on demand (device-side, one jit call) and streams PNGs to a browser
page with the same interactive controls the reference exposes: orbit angle,
camera offset, focal length, tiling on/off, erf mode, and live scene edits
(global sigma/magnitude multipliers — the analog of the ImGui per-Gaussian
sliders mutating staging_gaussians, main.cpp:234-241). Frame time is shown
like the reference's ImGui stats window.

Usage:  python -m sgrt_tpu.viewer [-f scene.obj | -g DIM] [--port 8765]
"""

from __future__ import annotations

import argparse
import json
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

_PAGE = """<!DOCTYPE html>
<html><head><title>sgrt_tpu viewer</title><style>
body { font-family: monospace; background: #111; color: #ddd; margin: 2em; }
.row { margin: 0.4em 0; }
label { display: inline-block; width: 14em; }
img { image-rendering: pixelated; border: 1px solid #444; margin-top: 1em; }
#stats { color: #8f8; }
</style></head><body>
<h2>sgrt_tpu — volumetric Gaussian ray tracer</h2>
<div class="row"><label>orbit angle</label>
  <input type="range" id="angle" min="0" max="360" step="1" value="30"></div>
<div class="row"><label>camera offset</label>
  <input type="range" id="offset" min="-10" max="-1" step="0.1" value="-4"></div>
<div class="row"><label>focal length</label>
  <input type="range" id="focal" min="0.2" max="3" step="0.05" value="1"></div>
<div class="row"><label>sigma scale</label>
  <input type="range" id="sigma" min="0.2" max="3" step="0.05" value="1"></div>
<div class="row"><label>magnitude scale</label>
  <input type="range" id="mag" min="0.1" max="4" step="0.05" value="1"></div>
<div class="row"><label>tiled (modes 5-8)</label>
  <input type="checkbox" id="tiled" checked></div>
<div class="row"><label>erf</label>
  <select id="erf"><option>as5</option><option>as3</option>
  <option>taylor</option><option>spline_mirror</option></select></div>
<div class="row" id="stats">-</div>
<img id="view" width="512" height="512">
<script>
const ids = ['angle','offset','focal','sigma','mag','tiled','erf'];
let busy = false, dirty = false;
async function refresh() {
  if (busy) { dirty = true; return; }
  busy = true;
  const p = new URLSearchParams();
  for (const id of ids) {
    const el = document.getElementById(id);
    p.set(id, el.type === 'checkbox' ? (el.checked ? 1 : 0) : el.value);
  }
  const t0 = performance.now();
  const resp = await fetch('/render?' + p.toString());
  const ms = resp.headers.get('X-Render-Ms');
  const blob = await resp.blob();
  document.getElementById('view').src = URL.createObjectURL(blob);
  document.getElementById('stats').textContent =
    `device render: ${ms} ms   round-trip: ${(performance.now()-t0).toFixed(1)} ms`;
  busy = false;
  if (dirty) { dirty = false; refresh(); }
}
for (const id of ids)
  document.getElementById(id).addEventListener('input', refresh);
refresh();
</script></body></html>"""


def make_handler(scene, width, height, tiles, capacity):
    import numpy as np

    from sgrt_tpu.ops.frame import render_orbit_frame
    from sgrt_tpu.utils.image import encode_png, to_rgba_u8

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def do_GET(self):
            url = urlparse(self.path)
            if url.path == "/":
                body = _PAGE.encode()
                self.send_response(200)
                self.send_header("Content-Type", "text/html")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
                return
            if url.path != "/render":
                self.send_response(404)
                self.end_headers()
                return
            q = {k: v[0] for k, v in parse_qs(url.query).items()}
            edited = scene.replace(
                sigma=scene.sigma * float(q.get("sigma", 1)),
                magnitude=scene.magnitude * float(q.get("mag", 1)),
            )
            t0 = time.perf_counter()
            img, _ = render_orbit_frame(
                edited,
                float(q.get("angle", 30)),
                float(q.get("offset", -4)),
                float(q.get("focal", 1)),
                width=width, height=height, tiles=tiles, capacity=capacity,
                use_tiling=q.get("tiled", "1") == "1",
                backend="pallas", erf_name=q.get("erf", "as5"),
            )
            img_np = np.asarray(img)  # device sync
            ms = (time.perf_counter() - t0) * 1e3
            png = encode_png(to_rgba_u8(img_np))
            self.send_response(200)
            self.send_header("Content-Type", "image/png")
            self.send_header("Content-Length", str(len(png)))
            self.send_header("X-Render-Ms", f"{ms:.1f}")
            self.end_headers()
            self.wfile.write(png)

    return Handler


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description="sgrt_tpu interactive viewer")
    ap.add_argument("--file", "-f", default=None)
    ap.add_argument("--grid", "-g", type=int, default=4)
    ap.add_argument("--width", "-w", type=int, default=256)
    ap.add_argument("--height", type=int, default=256)
    ap.add_argument("--tiles", type=int, default=16)
    ap.add_argument("--port", type=int, default=8765)
    args = ap.parse_args(argv)

    from sgrt_tpu.models.gaussians import grid_scene, scene_from_obj
    from sgrt_tpu.ops.frame import probe_capacity

    scene = (scene_from_obj(args.file) if args.file
             else grid_scene(args.grid))
    cap = max(32, int(probe_capacity(
        scene, [0.0, 45.0, 90.0, 135.0, 180.0], -4.0, 1.0, args.tiles) * 1.5))

    handler = make_handler(scene, args.width, args.height, args.tiles, cap)
    server = ThreadingHTTPServer(("127.0.0.1", args.port), handler)
    print(f"sgrt_tpu viewer: http://127.0.0.1:{args.port}/  "
          f"({scene.n} Gaussians, capacity {cap})")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
