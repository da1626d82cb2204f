"""Capture an xprof trace of the teapot train step and write a NAMED-SPAN
breakdown to docs/TRACE.md — the committed-trace analog of the reference's
HPCToolkit runs (run-hpc.sh:7-16), complementing docs/EFFICIENCY.md's
work-model numbers with the profiler's own attribution.

Attribution design (fixes the round-4 regression of an unattributable op
dump with double-counted async rows):
  - events come from the device plane's "XLA Ops" line ONLY (the "Async
    XLA Ops" line re-reports the same spans; "XLA Modules"/"Steps" are
    aggregates — including them double-counts);
  - each op's `tf_op` stat carries the jax.named_scope path ("tiling",
    "gather", "optimizer" scopes annotated in ops/tiling.py and
    parallel/fit.py), and Pallas custom-calls are the fwd (jvp__*) /
    bwd (transpose_jvp__*) kernels, giving six named spans whose rows sum
    to the module total;
  - every top op also carries its `source` stat (repo file:line).

Parsing: the installed tensorboard_plugin_profile converter is
incompatible with this TF build, so the xplane proto is read directly
(tensorflow.tsl.profiler.protobuf.xplane_pb2) with the pure-python
protobuf impl. Run on the TPU: python scripts/trace_step.py
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
N_STEPS = 3


def capture():
    import jax
    import jax.numpy as jnp
    import optax

    from sgrt_tpu.models.gaussians import scene_from_obj
    from sgrt_tpu.ops.frame import orbit_camera, probe_buckets, probe_capacity
    from sgrt_tpu.parallel.fit import init_state, make_frame_train_step

    scene = scene_from_obj(TEAPOT)
    tiles = (32, 16)
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
        for _ in range(N_STEPS):
            state, loss, ovf = step(state, cam.view_matrix, o, dirs, target)
        float(loss)


def _category(hlo_name: str, tf_op: str, hlo_cat: str) -> str:
    if "custom" in hlo_name and "custom-call" in hlo_name:
        return ("bwd kernel" if hlo_name.startswith("%transpose_jvp")
                else "fwd kernel")
    if "(tiling)" in tf_op or "/tiling/" in tf_op:
        return "tiling"
    if "(gather)" in tf_op or "/gather/" in tf_op:
        return "gather"
    if "(optimizer)" in tf_op or "/optimizer/" in tf_op:
        return "optimizer"
    if hlo_cat == "data formatting" or hlo_name.startswith(("%copy",
                                                            "%bitcast")):
        return "layout copies"
    return "other XLA"


def parse():
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    files = sorted(glob.glob(os.path.join(
        TRACE_DIR, "**", "*.xplane.pb"), recursive=True))
    assert files, f"no xplane.pb under {TRACE_DIR}"
    space = xplane_pb2.XSpace()
    with open(files[-1], "rb") as f:
        space.ParseFromString(f.read())

    plane = next(p for p in space.planes if p.name == "/device:TPU:0")
    stat_md = {i: m.name for i, m in plane.stat_metadata.items()}

    def md_stats(m):
        return {stat_md.get(s.metadata_id, "?"): (s.str_value or s.int64_value)
                for s in m.stats}

    module_ms = 0.0
    for ln in plane.lines:
        if ln.name == "XLA Modules":
            module_ms = sum(ev.duration_ps for ev in ln.events) / 1e9

    cats = defaultdict(float)
    ops = defaultdict(lambda: [0.0, 0, "", ""])   # ms, calls, source, cat
    for ln in plane.lines:
        if ln.name != "XLA Ops":
            continue
        for ev in ln.events:
            m = plane.event_metadata[ev.metadata_id]
            ms = ev.duration_ps / 1e9
            st = md_stats(m)
            cat = _category(m.name, str(st.get("tf_op", "")),
                            str(st.get("hlo_category", "")))
            shell = m.name.startswith(("%while", "%conditional"))
            if not shell:
                # control-flow shells re-report their body ops' time (the
                # bodies appear on the same line with proper scopes) —
                # counting both would double-count
                cats[cat] += ms
            name = m.name.split(" = ")[0]
            ops[name][0] += ms
            ops[name][1] += 1
            ops[name][2] = str(st.get("source", ""))
            ops[name][3] = "(loop shell)" if shell else cat
    return module_ms, cats, ops


def main():
    capture()
    module_ms, cats, ops = parse()
    per_step = module_ms / N_STEPS
    lines = [
        "# TRACE — named-span breakdown of the teapot train step",
        "",
        f"{N_STEPS} steps of the bucketed (32,16) teapot train step at 256²",
        "captured with `jax.profiler.trace` on the TPU v5e. Spans come from",
        "the device plane's `XLA Ops` line only (async/module lines excluded",
        "— they re-report the same time); categories map each op's named",
        "scope (`tf_op`) / kernel role / HLO category. All numbers are",
        "per-step (total / 3).",
        "",
        f"Module (whole-step device) time: **{per_step:.2f} ms/step**.",
        "",
        "| span | ms/step | % of step |",
        "|---|---|---|",
    ]
    order = ["fwd kernel", "bwd kernel", "tiling", "gather", "optimizer",
             "layout copies", "other XLA"]
    span_sum = sum(cats.values())
    for cat in order:
        ms = cats.get(cat, 0.0) / N_STEPS
        lines.append(f"| {cat} | {ms:.2f} | "
                     f"{100 * ms / max(per_step, 1e-9):.1f}% |")
    lines += [
        f"| **sum of spans** | **{span_sum / N_STEPS:.2f}** | "
        f"{100 * span_sum / max(module_ms, 1e-9):.1f}% |",
        "",
        "(The span sum can fall below the module time by the device's",
        "inter-op gaps, and marginally above it when short ops overlap the",
        "module boundary — it is the same single-line accounting either",
        "way, not double counting.)",
        "",
        "## Top ops (with source attribution)",
        "",
        "| op | span | ms/step | calls/step | source |",
        "|---|---|---|---|---|",
    ]
    top = sorted(ops.items(), key=lambda kv: -kv[1][0])[:12]
    for name, (ms, cnt, source, cat) in top:
        src = source.replace("/root/repo/", "")
        lines.append(f"| `{name[:40]}` | {cat} | {ms / N_STEPS:.2f} | "
                     f"{cnt // N_STEPS} | {src} |")
    lines.append("")
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", "TRACE.md")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(lines))
    print(f"written: {out}")


if __name__ == "__main__":
    main()
