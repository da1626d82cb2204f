"""Config sweep for the headline bench: scene x tile grids (incl. rectangular)
x scheduler x dense fraction; SWEEP_EXP selects the exp approximation.

Same protocol as bench.py (orbit, 256x256, pipelined dispatch, single end
fetch); prints one line per config. Covers the teapot (the north-star scene,
BASELINE.md) as well as the cube, and sweeps the bucketed scheduler's
pb/qb/dense_frac — the analog of the reference's tiling analysis
(thesis main.tex:1765-1771). Noise note: a tunneled TPU occasionally stalls
for seconds — each config runs twice and we keep the better (min) average.

Usage: python scripts/sweep_bench.py [cube|teapot|both] [--fwdbwd]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from sgrt_tpu.models.gaussians import scene_from_obj
from sgrt_tpu.ops.frame import probe_buckets, probe_capacity, render_orbit_frame

OBJS = {
    "cube": "/root/reference/test-objects/cube.obj",
    "teapot": "/root/reference/test-objects/teapot.obj",
}


def measure(frame, frames=50):
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


def sweep_scene(name: str, results: list):
    scene = scene_from_obj(OBJS[name])
    angles = [0.0, 30.0, 45.0, 60.0, 90.0]

    for tiles in (8, 16, 32, (16, 32), (32, 16)):
        cap = max(64, int(probe_capacity(scene, angles, -4.0, 1.0, tiles) * 1.3))
        cfgs = [("plain", dict())]
        for frac in (0.0625, 0.125, 0.25):
            bucket = probe_buckets(scene, angles, -4.0, 1.0, tiles,
                                   margin=1.3, dense_frac=frac)
            cfgs.append((f"bucket{frac}", dict(bucket_cfg=bucket)))
        for cfg_name, kw in cfgs:
            def frame(a, kw=kw, tiles=tiles, cap=cap):
                img, _ = render_orbit_frame(
                    scene, a, -4.0, 1.0, width=256, height=256, tiles=tiles,
                    capacity=cap, backend="pallas", erf_name="as3",
                    exp_name=os.environ.get("SWEEP_EXP", "exact"), **kw)
                return img
            try:
                avg = measure(frame)
            except Exception as e:  # noqa: BLE001
                print(f"{name:7s} tiles={str(tiles):8s} {cfg_name:12s} FAILED: "
                      f"{type(e).__name__}: {str(e)[:100]}", flush=True)
                continue
            rate = 256 * 256 / avg
            results.append((rate, name, tiles, cfg_name))
            print(f"{name:7s} tiles={str(tiles):8s} {cfg_name:12s} cap={cap:4d} "
                  f"{avg*1e3:8.3f} ms  {rate/1e6:7.2f} Mrays/s", flush=True)


def sweep_fwdbwd(name: str, results: list):
    """North-star sweep: the tiled TRAIN STEP (fwd + custom-VJP bwd +
    optimizer) across tile grids x dense_frac x saved-T-vs-recompute."""
    import optax

    import sgrt_tpu.ops.pallas_kernel as pk
    from sgrt_tpu.ops.frame import orbit_camera
    from sgrt_tpu.parallel.fit import init_state, make_frame_train_step

    scene = scene_from_obj(OBJS[name])
    angles = [0.0, 30.0, 45.0, 60.0, 90.0]
    cam = orbit_camera(30.0, -4.0, 1.0, 256, 256)
    o, dirs = cam.rays()
    target, _ = render_orbit_frame(
        scene, 35.0, -4.0, 1.0, width=256, height=256, tiles=(16, 32),
        capacity=max(64, int(probe_capacity(scene, angles, -4.0, 1.0,
                                            (16, 32)) * 1.3)),
        backend="pallas")
    opt = optax.adam(1e-3)
    save_t_default = pk.SAVE_T_MAX_BYTES

    for tiles in (16, (16, 32), (8, 32), (32, 16)):
        cap = max(64, int(probe_capacity(scene, angles, -4.0, 1.0, tiles) * 1.3))
        for frac in (0.125, 0.25):
            bucket = probe_buckets(scene, angles, -4.0, 1.0, tiles,
                                   margin=1.3, dense_frac=frac)
            for st_name, st_bytes in (("saveT", 1 << 30), ("recompute", 0)):
                pk.SAVE_T_MAX_BYTES = st_bytes
                pk._make_fused_op.cache_clear()
                try:
                    step = make_frame_train_step(
                        opt, width=256, height=256, tiles=tiles,
                        capacity=cap, backend="pallas", erf_name="as5",
                        bucket_cfg=bucket)
                    state = init_state(scene, opt)
                    state, loss, ovf = step(state, cam.view_matrix, o, dirs,
                                            target)
                    assert int(ovf) == 0
                    float(loss)
                    best = float("inf")
                    for _ in range(2):
                        t0 = time.perf_counter()
                        for _ in range(15):
                            state, loss, ovf = step(state, cam.view_matrix,
                                                    o, dirs, target)
                        float(loss)
                        best = min(best, (time.perf_counter() - t0) / 15)
                except Exception as e:  # noqa: BLE001
                    print(f"{name} step tiles={str(tiles):8s} frac={frac} "
                          f"{st_name:9s} FAILED: {type(e).__name__}: "
                          f"{str(e)[:80]}", flush=True)
                    continue
                finally:
                    pk.SAVE_T_MAX_BYTES = save_t_default
                rate = 256 * 256 / best
                results.append((rate, name + "_step", tiles,
                                f"frac{frac}_{st_name}"))
                print(f"{name} step tiles={str(tiles):8s} frac={frac} "
                      f"{st_name:9s} cap={cap:4d} {best*1e3:8.2f} ms  "
                      f"{rate/1e3:7.1f} Krays/s", flush=True)


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    which = args[0] if args else "both"
    names = list(OBJS) if which == "both" else [which]
    results = []
    for name in names:
        if "--fwdbwd" in sys.argv:
            sweep_fwdbwd(name, results)
        else:
            sweep_scene(name, results)
    if results:
        results.sort(reverse=True)
        print("BEST:", results[0])
    else:
        print("no config succeeded")
        return 1


if __name__ == "__main__":
    sys.exit(main())
