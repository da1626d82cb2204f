"""Fit demo — the north-star capability made visible (BASELINE config 4;
no reference analog: the reference is forward-only).

Perturbs the teapot scene (means jittered, magnitudes dimmed), fits it back
against 4 target renders from different orbit angles with the bucketed tiled
train step, and commits the artifacts:

    docs/fit_demo/target.png  before.png  after.png
    docs/fit_demo/loss.png  loss.csv

Run on the TPU: python scripts/fit_demo.py [--steps 400]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

TEAPOT = "/root/reference/test-objects/teapot.obj"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "docs", "fit_demo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--res", type=int, default=256)
    ap.add_argument("--lr", type=float, default=2e-3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from sgrt_tpu.models.gaussians import scene_from_obj
    from sgrt_tpu.ops.frame import (orbit_camera, probe_buckets,
                                    probe_capacity, render_orbit_frame)
    from sgrt_tpu.parallel.fit import init_state, make_frame_train_step
    from sgrt_tpu.utils.image import write_png

    res, tiles = args.res, (16, 32)
    angles = [0.0, 90.0, 180.0, 270.0]
    view_angle = 30.0                      # held-out render for the PNGs

    scene = scene_from_obj(TEAPOT)
    cap = max(64, int(probe_capacity(scene, angles + [view_angle], -4.0, 1.0,
                                     tiles) * 1.3))
    bc = probe_buckets(scene, angles + [view_angle], -4.0, 1.0, tiles,
                       margin=1.3)

    def frame(s, angle):
        img, ovf = render_orbit_frame(
            s, angle, -4.0, 1.0, width=res, height=res, tiles=tiles,
            capacity=cap, backend="pallas", bucket_cfg=bc)
        assert int(ovf) == 0
        return img

    cams = [orbit_camera(a, -4.0, 1.0, res, res) for a in angles]
    targets = [frame(scene, a) for a in angles]

    rng = np.random.default_rng(7)
    noisy = scene.replace(
        mu=scene.mu + jnp.asarray(
            rng.normal(0, 0.05, scene.mu.shape), jnp.float32),
        magnitude=scene.magnitude * 0.6,
    )

    os.makedirs(OUT, exist_ok=True)
    write_png(os.path.join(OUT, "target.png"),
              np.asarray(frame(scene, view_angle)))
    write_png(os.path.join(OUT, "before.png"),
              np.asarray(frame(noisy, view_angle)))

    opt = optax.adam(args.lr)
    step = make_frame_train_step(opt, width=res, height=res, tiles=tiles,
                                 capacity=cap, backend="pallas",
                                 bucket_cfg=bc)
    state = init_state(noisy, opt)
    losses = []
    for i in range(args.steps):
        k = i % len(angles)
        o, dirs = cams[k].rays()
        state, loss, ovf = step(state, cams[k].view_matrix, o, dirs,
                                targets[k])
        if int(ovf):
            raise RuntimeError(f"capacity overflow at step {i}")
        if i % 10 == 0 or i == args.steps - 1:
            lv = float(loss)
            losses.append((i, lv))
            if i % 50 == 0:
                print(f"step {i:4d}  loss {lv:.3e}")

    write_png(os.path.join(OUT, "after.png"),
              np.asarray(frame(state.scene, view_angle)))

    with open(os.path.join(OUT, "loss.csv"), "w") as f:
        f.write("step,loss\n")
        for i, lv in losses:
            f.write(f"{i},{lv:.6e}\n")

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    steps_, vals = zip(*losses)
    fig, ax = plt.subplots(figsize=(6, 3.5), dpi=120)
    ax.semilogy(steps_, vals, lw=1.5)
    ax.set_xlabel("train step")
    ax.set_ylabel("frame MSE (4-view orbit)")
    ax.set_title("teapot fit: perturbed scene → target renders")
    ax.grid(True, alpha=0.3)
    fig.tight_layout()
    fig.savefig(os.path.join(OUT, "loss.png"))
    print(f"first loss {losses[0][1]:.3e} -> final {losses[-1][1]:.3e} "
          f"({losses[0][1] / max(losses[-1][1], 1e-12):.0f}x)")
    print(f"artifacts in {OUT}")


if __name__ == "__main__":
    main()
