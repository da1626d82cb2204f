"""Config sweep for the headline bench: tiles / block sizes / rb / erf.

Same protocol as bench.py (cube.obj orbit, 256x256, pipelined dispatch,
single end fetch); prints one line per config. Noise note: a tunneled TPU
occasionally stalls for seconds — each config runs twice and we keep the
better (min) average.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from sgrt_tpu.models.gaussians import scene_from_obj
from sgrt_tpu.ops.frame import probe_buckets, probe_capacity, render_orbit_frame

CUBE = "/root/reference/test-objects/cube.obj"


def measure(frame, frames=100):
    angs = jnp.arange(frames, dtype=jnp.float32) * (360.0 / frames)
    float(jnp.sum(frame(angs[0])))
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        img = None
        for i in range(frames):
            img = frame(angs[i])
        float(jnp.sum(img))
        best = min(best, (time.perf_counter() - t0) / frames)
    return best


def main():
    scene = scene_from_obj(CUBE)
    angles = [0.0, 30.0, 45.0, 60.0, 90.0]

    results = []
    for tiles in (8, 16, 32):
        cap = max(64, int(probe_capacity(scene, angles, -4.0, 1.0, tiles) * 1.3))
        bucket = probe_buckets(scene, angles, -4.0, 1.0, tiles, margin=1.3)
        for cfg_name, kw in (
            ("bucketed", dict(bucket_cfg=bucket)),
            ("plain", dict()),
        ):
            def frame(a, kw=kw, tiles=tiles, cap=cap):
                img, _ = render_orbit_frame(
                    scene, a, -4.0, 1.0, width=256, height=256, tiles=tiles,
                    capacity=cap, backend="pallas", erf_name="as3", **kw)
                return img
            try:
                avg = measure(frame)
            except Exception as e:  # noqa: BLE001
                print(f"tiles={tiles:3d} {cfg_name:9s} FAILED: {e}")
                continue
            rate = 256 * 256 / avg
            results.append((rate, tiles, cfg_name))
            print(f"tiles={tiles:3d} {cfg_name:9s} cap={cap:4d} "
                  f"{avg*1e3:8.3f} ms  {rate/1e6:7.2f} Mrays/s", flush=True)

    results.sort(reverse=True)
    print("BEST:", results[0])


if __name__ == "__main__":
    sys.exit(main())
