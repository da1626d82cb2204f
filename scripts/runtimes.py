"""Render-mode sweep — the analog of the reference's runtimes.sh
(cube.obj, modes x compilers x SVML → runtimes.log with AVG. TIME lines).
On TPU the compiler axis collapses (one XLA) and the SVML axis becomes the
erf implementation; the mode axis becomes {untiled, tiled, tiled+bucketed}
x {xla, pallas}.

Usage: python scripts/runtimes.py [--frames 50] [--obj path] [--log runtimes.log]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=50)
    ap.add_argument("--obj", default="/root/reference/test-objects/cube.obj")
    ap.add_argument("--log", default="runtimes.log")
    args = ap.parse_args()

    import jax.numpy as jnp

    from sgrt_tpu.models.gaussians import scene_from_obj
    from sgrt_tpu.ops.frame import (probe_buckets, probe_capacity,
                                    render_orbit_frame)

    scene = scene_from_obj(args.obj)
    angles = [0.0, 30.0, 45.0, 60.0, 90.0]
    cap = max(64, int(probe_capacity(scene, angles, -4.0, 1.0, 16) * 1.3))
    bucket = probe_buckets(scene, angles, -4.0, 1.0, 16, margin=1.3)

    rows = [
        ("mode1_untiled_xla", dict(use_tiling=False, backend="xla")),
        ("mode1_untiled_pallas", dict(use_tiling=False, backend="pallas")),
        ("mode8_tiled_xla", dict(backend="xla")),
        ("mode8_tiled_pallas_exact", dict(backend="pallas", erf_name="as5")),
        ("mode8_tiled_pallas_as3", dict(backend="pallas", erf_name="as3")),
        ("mode8_bucketed_pallas_as3",
         dict(backend="pallas", erf_name="as3", bucket_cfg=bucket)),
    ]

    lines = [f"scene={args.obj} N={scene.n} frames={args.frames} capacity={cap} "
             f"bucket={bucket}"]
    print(lines[0])
    for name, kw in rows:
        def frame(a):
            img, _ = render_orbit_frame(scene, a, capacity=cap, tiles=16, **kw)
            return img

        float(jnp.sum(frame(0.0)))  # compile + sync
        t0 = time.perf_counter()
        img = None
        for i in range(args.frames):
            img = frame(i * 360.0 / args.frames)
        float(jnp.sum(img))
        avg = (time.perf_counter() - t0) / args.frames * 1e3
        line = f"{name:32s} AVG. TIME: {avg:10.3f} ms  ({65536/avg:8.1f} Krays/s)"
        print(line)
        lines.append(line)

    with open(args.log, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {args.log}")


if __name__ == "__main__":
    main()
