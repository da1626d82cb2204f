"""Multi-device scaling benchmark — rays/s scaling efficiency of the
tile-sharded training step from 1 device to all available devices (the
BASELINE.json north-star asks >=85% efficiency to N>=2 hosts).

On real multi-chip hardware this measures true ICI scaling. On a
single-chip or CPU rig it still runs (virtual devices via
--virtual-devices N) to validate the mechanics, but the printed numbers
then measure host parallelism, not ICI — the output labels which.

Usage: python bench_scaling.py [--virtual-devices 8] [--steps 10]
"""

from __future__ import annotations

import argparse
import json
import os
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--virtual-devices", type=int, default=0,
                    help="Force N virtual CPU devices (testing rig).")
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--obj", default="/root/reference/test-objects/teapot.obj")
    ap.add_argument("--res", type=int, default=256)
    ap.add_argument("--tiles", type=int, default=16)
    args = ap.parse_args()

    if args.virtual_devices:
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", args.virtual_devices)
    else:
        import jax

    import jax.numpy as jnp
    import optax

    from sgrt_tpu.models.gaussians import scene_from_obj
    from sgrt_tpu.ops.frame import (orbit_camera, probe_capacity,
                                    render_orbit_frame)
    from sgrt_tpu.parallel.fit import init_state, make_frame_train_step
    from sgrt_tpu.parallel.mesh import make_mesh

    devices = jax.devices()
    real = devices[0].platform == "tpu"
    print(f"devices: {len(devices)} x {devices[0].platform} "
          f"({'ICI scaling' if real and len(devices) > 1 else 'mechanics only'})")

    from sgrt_tpu.ops.frame import probe_buckets

    scene = scene_from_obj(args.obj)
    cam = orbit_camera(0.0, -4.0, 1.0, args.res, args.res)
    o, dirs = cam.rays()
    cap = int(probe_capacity(scene, [0.0], -4.0, 1.0, args.tiles) * 1.1)
    target, _ = render_orbit_frame(scene, 0.0, width=args.res, height=args.res,
                                   tiles=args.tiles, capacity=cap,
                                   backend="pallas")
    opt = optax.adam(1e-3)
    rays = args.res * args.res

    def fresh_noisy():
        # deep copy: the train step donates its state buffers
        return jax.tree_util.tree_map(
            lambda a: jnp.array(a), scene.replace(mu=scene.mu + 0.02))

    def measure(n_dev):
        mesh = make_mesh(devices[:n_dev]) if n_dev > 1 else None
        # bucketed scheduler on every mesh size (the sharded path interleaves
        # each bucket round-robin over devices); sizes must divide the mesh
        bc = probe_buckets(scene, [0.0], -4.0, 1.0, args.tiles,
                           multiple_of=max(n_dev, 1))
        step = make_frame_train_step(opt, width=args.res, height=args.res,
                                     tiles=args.tiles, capacity=cap, mesh=mesh,
                                     bucket_cfg=bc)
        st = init_state(fresh_noisy(), opt, mesh)
        st, l, overflow = step(st, cam.view_matrix, o, dirs, target)
        float(l)
        assert int(overflow) == 0, f"capacity {cap} overflowed ({int(overflow)} tiles)"
        t0 = time.perf_counter()
        for _ in range(args.steps):
            st, l, overflow = step(st, cam.view_matrix, o, dirs, target)
        float(l)
        return (time.perf_counter() - t0) / args.steps

    n = 1
    results = []
    while n <= len(devices):
        t = measure(n)
        results.append((n, t))
        n *= 2
    base = results[0][1]
    for n_dev, t in results:
        eff = base / (t * n_dev) * 100.0
        print(json.dumps({
            "devices": n_dev,
            "step_ms": round(t * 1e3, 1),
            "rays_per_s_fwdbwd": round(rays / t, 1),
            "scaling_efficiency_pct": round(eff, 1),
            "hardware": "tpu-ici" if real and n_dev > 1 else
                        ("tpu-single" if real else "cpu-virtual"),
        }))


if __name__ == "__main__":
    main()
