"""Capture an xprof trace of the teapot train step and write the op-time
breakdown to docs/TRACE.md — the committed-trace analog of the reference's
HPCToolkit runs (run-hpc.sh:7-16), complementing docs/EFFICIENCY.md's
work-model numbers with the profiler's own attribution.

Parsing: the installed tensorboard_plugin_profile converter is incompatible
with this TF build, so the xplane proto is read directly
(tensorflow.tsl.profiler.protobuf.xplane_pb2) with the pure-python protobuf
impl. Run on the TPU: python scripts/trace_step.py
"""

from __future__ import annotations

import glob
import os
import sys
from collections import defaultdict

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TEAPOT = "/root/reference/test-objects/teapot.obj"
TRACE_DIR = "/tmp/sgrt_trace"


def capture():
    import jax
    import jax.numpy as jnp
    import optax

    from sgrt_tpu.models.gaussians import scene_from_obj
    from sgrt_tpu.ops.frame import orbit_camera, probe_buckets, probe_capacity
    from sgrt_tpu.parallel.fit import init_state, make_frame_train_step

    scene = scene_from_obj(TEAPOT)
    tiles = (16, 32)
    angles = [0.0, 30.0, 45.0, 60.0, 90.0]
    cap = max(64, int(probe_capacity(scene, angles, -4.0, 1.0, tiles) * 1.3))
    bc = probe_buckets(scene, angles, -4.0, 1.0, tiles, margin=1.3)
    cam = orbit_camera(30.0, -4.0, 1.0, 256, 256)
    o, dirs = cam.rays()
    target = jnp.zeros((256, 256, 3), jnp.float32)
    opt = optax.adam(1e-3)
    step = make_frame_train_step(opt, width=256, height=256, tiles=tiles,
                                 capacity=cap, backend="pallas",
                                 erf_name="as5", bucket_cfg=bc)
    state = init_state(scene, opt)
    state, loss, ovf = step(state, cam.view_matrix, o, dirs, target)
    assert int(ovf) == 0
    float(loss)

    with jax.profiler.trace(TRACE_DIR):
        for _ in range(3):
            state, loss, ovf = step(state, cam.view_matrix, o, dirs, target)
        float(loss)


def parse():
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    files = sorted(glob.glob(os.path.join(
        TRACE_DIR, "**", "*.xplane.pb"), recursive=True))
    assert files, f"no xplane.pb under {TRACE_DIR}"
    space = xplane_pb2.XSpace()
    with open(files[-1], "rb") as f:
        space.ParseFromString(f.read())

    # device planes hold per-op events; aggregate duration by event name
    rows = []
    for plane in space.planes:
        if "TPU" not in plane.name and "/device" not in plane.name.lower():
            continue
        # Full HLO-instruction dumps make unreadable rows; keep only the
        # instruction name (lhs of " = ") — the shape detail lives in the
        # trace file itself.
        ev_names = {i: m.name.split(" = ")[0] for i, m in
                    plane.event_metadata.items()}
        agg = defaultdict(lambda: [0.0, 0])
        for line in plane.lines:
            for ev in line.events:
                name = ev_names.get(ev.metadata_id, "?")
                agg[name][0] += ev.duration_ps / 1e9   # ms
                agg[name][1] += 1
        if agg:
            rows.append((plane.name, sorted(
                agg.items(), key=lambda kv: -kv[1][0])))
    return rows


def main():
    capture()
    rows = parse()
    lines = [
        "# TRACE — profiler op-time breakdown of the teapot train step",
        "",
        "3 steps of the bucketed (16,32) teapot train step captured with",
        "`jax.profiler.trace` on the TPU (the committed-trace analog of the",
        "reference's HPCToolkit runs, run-hpc.sh:7-16). Durations are",
        "summed over the 3 steps; divide by 3 for per-step cost.",
        "",
    ]
    for plane_name, agg in rows:
        total = sum(v[0] for _, v in agg)
        lines += [f"## {plane_name} (total {total:.1f} ms)", "",
                  "| op | ms (3 steps) | % | calls |", "|---|---|---|---|"]
        shown = 0.0
        for name, (ms, cnt) in agg[:20]:
            lines.append(f"| `{name[:70]}` | {ms:.2f} | "
                         f"{100 * ms / max(total, 1e-9):.1f}% | {cnt} |")
            shown += ms
        rest = total - shown
        if rest > 0.005 * total:
            lines.append(f"| (all other ops) | {rest:.2f} | "
                         f"{100 * rest / max(total, 1e-9):.1f}% | |")
        lines.append("")
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", "TRACE.md")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(lines[:40]))
    print(f"written: {out}")


if __name__ == "__main__":
    main()
