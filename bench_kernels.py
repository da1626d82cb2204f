"""Per-function microbenchmarks — the analog of the reference's cycles-test
(src/volumetric-ray-tracer/tests/approx_cycles.cpp: rdpmc cycle counts per
erf/exp approximation, 10000 iters x 2048 values) and of its runtimes.sh
render sweep. On TPU the unit is ns/value wall time (hardware counters are
not exposed through the runtime); every timed span is bounded by a host
data fetch — the only reliable sync on a tunneled device.

Usage: python bench_kernels.py [--csv out.csv]
Writes a table of: erf/exp approximations (ns/value), the fused kernel
forward and backward (effective erf evals/s), and full-frame configs.
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def _time(f, n_iter=20, warmup=2):
    for _ in range(warmup):
        r = f()
    jnp.sum(r).block_until_ready()
    float(jnp.sum(r))
    t0 = time.perf_counter()
    for _ in range(n_iter):
        r = f()
    float(jnp.sum(r))
    return (time.perf_counter() - t0) / n_iter


def bench_approx(rows):
    from sgrt_tpu.ops import approx

    n = 1 << 22  # 4M values
    x_erf = jnp.asarray(np.random.default_rng(0).uniform(-6, 6, n), jnp.float32)
    x_exp = jnp.asarray(np.random.default_rng(1).uniform(-16, 0, n), jnp.float32)

    for name, fn in approx.ERF_IMPLS.items():
        f = jax.jit(fn)
        t = _time(lambda: f(x_erf))
        rows.append(("erf_" + name, t / n * 1e9, "ns/value"))
    for name, fn in approx.EXP_IMPLS.items():
        f = jax.jit(fn)
        t = _time(lambda: f(x_exp))
        rows.append(("exp_" + name, t / n * 1e9, "ns/value"))


def bench_kernel(rows):
    from sgrt_tpu.models.camera import Camera
    from sgrt_tpu.models.gaussians import grid_scene
    from sgrt_tpu.ops.pallas_kernel import render_rays_pallas

    scene = grid_scene(16, sigma=0.25, magnitude=3.0)  # 256 Gaussians
    cam = Camera.create(position=(0.0, 0.0, -4.0), width=256, height=256)
    o, dirs = cam.rays()
    r, n = dirs.shape[0], 256

    t = _time(lambda: render_rays_pallas(o, dirs, scene))
    n_erf = r * 6 * n * n
    rows.append(("kernel_fwd_untiled_256g", t * 1e3, "ms"))
    rows.append(("kernel_fwd_erf_rate", n_erf / t / 1e9, "Gerf/s"))

    grad = jax.jit(jax.grad(
        lambda s: jnp.sum(render_rays_pallas(o, dirs, s) ** 2)))

    def g():
        gs = grad(scene)
        return gs.mu

    t = _time(g, n_iter=5)
    rows.append(("kernel_fwdbwd_untiled_256g", t * 1e3, "ms"))


def bench_frames(rows):
    import os

    from sgrt_tpu.models.gaussians import scene_from_obj
    from sgrt_tpu.ops.frame import probe_capacity, render_orbit_frame

    for obj in ("cube", "teapot"):
        path = f"/root/reference/test-objects/{obj}.obj"
        if not os.path.exists(path):
            continue
        scene = scene_from_obj(path)
        cap = max(64, int(probe_capacity(
            scene, [0.0, 30.0, 45.0, 60.0, 90.0], -4.0, 1.0, 16) * 1.3))

        def frame(a, erf):
            img, _ = render_orbit_frame(scene, a, capacity=cap,
                                        backend="pallas", erf_name=erf)
            return img

        for erf in ("as5", "as3"):
            frame(0.0, erf)
            t = _time(lambda: frame(12.3, erf), n_iter=20)
            rows.append((f"frame_{obj}_pallas_{erf}", t * 1e3, "ms"))
            rows.append((f"rays_per_s_{obj}_{erf}", 65536 / t / 1e3, "Krays/s"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--csv", default=None)
    ap.add_argument("--skip-frames", action="store_true")
    args = ap.parse_args()

    print(f"backend: {jax.default_backend()}  devices: {jax.devices()}")
    rows = []
    bench_approx(rows)
    bench_kernel(rows)
    if not args.skip_frames:
        bench_frames(rows)

    width = max(len(r[0]) for r in rows)
    for name, value, unit in rows:
        print(f"{name:<{width}}  {value:10.3f} {unit}")
    if args.csv:
        with open(args.csv, "w") as f:
            f.write("name,value,unit\n")
            for name, value, unit in rows:
                f.write(f"{name},{value},{unit}\n")


if __name__ == "__main__":
    main()
