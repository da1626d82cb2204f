"""Probe: teapot 256x256 fwd+bwd step time on real TPU, with/without buckets.

FINDINGS (round 2, TPU v5e): at tiles=16 the bucketed step cut the teapot
train step ~1.6x vs single-capacity (dense tiles keep cap ~1.3k, sparse
drop to ~100); the win grew with the rectangular (16,32) grid. Superseded
by scripts/probe_grid_sweep.py (grid x bucket sweep) and folded into the
defaults: bench.py uses (16,32) + probe_buckets.
"""
import time, sys
import jax, jax.numpy as jnp
import optax

from sgrt_tpu.models.gaussians import scene_from_obj
from sgrt_tpu.ops.frame import orbit_camera, probe_capacity, probe_buckets
from sgrt_tpu.parallel.fit import make_frame_train_step, init_state

TEAPOT = "/root/reference/test-objects/teapot.obj"
scene = scene_from_obj(TEAPOT)
print("N =", scene.n)

tiles = int(sys.argv[1]) if len(sys.argv) > 1 else 16
use_buckets = len(sys.argv) > 2 and sys.argv[2] == "b"

angles = [0.0, 30.0, 45.0, 60.0, 90.0]
cap = max(64, int(probe_capacity(scene, angles, -4.0, 1.0, tiles) * 1.3))
print("capacity =", cap, "tiles =", tiles)
bucket_cfg = None
if use_buckets:
    bucket_cfg = probe_buckets(scene, angles, -4.0, 1.0, tiles, margin=1.3)
    print("bucket_cfg =", bucket_cfg)

opt = optax.adam(1e-3)
step = make_frame_train_step(opt, width=256, height=256, tiles=tiles,
                             capacity=cap, backend="pallas", erf_name="as5",
                             bucket_cfg=bucket_cfg)
state = init_state(scene, opt)
cam = orbit_camera(30.0, -4.0, 1.0, 256, 256)
o, dirs = cam.rays()
target = jnp.zeros((256, 256, 3), jnp.float32)

t0 = time.perf_counter()
state, loss, ovf = step(state, cam.view_matrix, o, dirs, target)
print("compile+1st:", time.perf_counter() - t0, "loss", float(loss), "ovf", int(ovf))

n_it = 20
t0 = time.perf_counter()
for _ in range(n_it):
    state, loss, ovf = step(state, cam.view_matrix, o, dirs, target)
lv = float(loss)
dt = (time.perf_counter() - t0) / n_it
print(f"step: {dt*1e3:.2f} ms  -> {256*256/dt/1e6:.3f} M rays/s  loss {lv:.6f}")
