"""Teapot 256^2 fwd / fwd+bwd across tile grids and bucket configs on TPU.

FINDINGS (round 2, TPU v5e): (16,32) rectangular grid (128 rays/tile =
exact VPU lane width) + buckets at dense_frac 0.125 won: ~144 ms/step vs
~254 ms for square 16x16 single-capacity. Square grids waste lanes (256
rays/tile = 2 lane rows at half occupancy after culling); coarser grids
inflate per-tile counts (cost ~count^2). These findings set the bench.py
defaults (BENCH_TILES=16x32).
"""
import itertools, sys, time
import jax, jax.numpy as jnp
import optax

from sgrt_tpu.models.gaussians import scene_from_obj
from sgrt_tpu.ops.frame import orbit_camera, probe_capacity, probe_buckets, render_orbit_frame
from sgrt_tpu.parallel.fit import make_frame_train_step, init_state

scene = scene_from_obj("/root/reference/test-objects/teapot.obj")
angles = [0.0, 30.0, 45.0, 60.0, 90.0]
cam = orbit_camera(30.0, -4.0, 1.0, 256, 256)
o, dirs = cam.rays()
target = jnp.zeros((256, 256, 3), jnp.float32)
opt = optax.adam(1e-3)


def bench(tiles, use_buckets, dense_frac=0.125):
    cap = max(64, int(probe_capacity(scene, angles, -4.0, 1.0, tiles) * 1.3))
    bc = (probe_buckets(scene, angles, -4.0, 1.0, tiles, margin=1.3,
                        dense_frac=dense_frac) if use_buckets else None)
    # forward
    fwd = lambda: render_orbit_frame(scene, 30.0, -4.0, 1.0, width=256,
                                     height=256, tiles=tiles, capacity=cap,
                                     backend="pallas", erf_name="as5",
                                     bucket_cfg=bc)[0]
    img = fwd(); float(jnp.sum(img))
    t0 = time.perf_counter()
    for _ in range(10):
        img = fwd()
    float(jnp.sum(img))
    t_fwd = (time.perf_counter() - t0) / 10
    # train step
    step = make_frame_train_step(opt, width=256, height=256, tiles=tiles,
                                 capacity=cap, backend="pallas",
                                 erf_name="as5", bucket_cfg=bc)
    # the step donates state (and with it the scene buffers): train on a copy
    state = init_state(jax.tree_util.tree_map(jnp.copy, scene), opt)
    state, loss, ovf = step(state, cam.view_matrix, o, dirs, target)
    assert int(ovf) == 0, f"overflow {int(ovf)}"
    float(loss)
    t0 = time.perf_counter()
    for _ in range(10):
        state, loss, ovf = step(state, cam.view_matrix, o, dirs, target)
    float(loss)
    t_step = (time.perf_counter() - t0) / 10
    print(f"tiles={tiles} buckets={use_buckets} df={dense_frac} cap={cap} "
          f"bc={bc}: fwd {t_fwd*1e3:.1f} ms, step {t_step*1e3:.1f} ms "
          f"({256*256/t_step/1e6:.3f} M rays/s)", flush=True)


configs = [
    ((16, 32), True, 0.125),
]
for tiles, ub, df in configs:
    try:
        bench(tiles, ub, df)
    except Exception as e:
        print(f"tiles={tiles} buckets={ub}: FAILED {type(e).__name__}: {e}",
              flush=True)
