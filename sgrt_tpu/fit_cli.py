"""Scene-fitting CLI — the training entry point (BASELINE config 4: "full
differentiable fit: backward pass optimizing means/covariances/opacities").

Renders target views of a ground-truth scene (obj or grid), perturbs the
scene, and recovers it by gradient descent through the fused kernel's
custom VJP, orbiting the camera across steps (each step sees a different
view, so the fit is multi-view). Checkpoints via orbax.

Usage:
  python -m sgrt_tpu.fit_cli -f teapot.obj --steps 200 --views 8 \
      --noise 0.02 --out fitted.png --checkpoint-dir ckpt/
"""

from __future__ import annotations

import argparse
import time


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description="Fit a Gaussian scene to target renders")
    ap.add_argument("--file", "-f", default=None, help="Ground-truth scene (.obj).")
    ap.add_argument("--grid", "-g", type=int, default=4)
    ap.add_argument("--width", "-w", type=int, default=128)
    ap.add_argument("--height", type=int, default=128)
    ap.add_argument("--tiles", type=int, default=8)
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--views", type=int, default=8,
                    help="Number of orbit views cycled during fitting.")
    ap.add_argument("--noise", type=float, default=0.02,
                    help="Stddev of the mu perturbation to recover from.")
    ap.add_argument("--lr", type=float, default=2e-3)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--trainable", default=None,
                    help="Comma list (default: mu,sigma,magnitude,albedo; "
                         "with --aniso: mu,scale,magnitude,albedo).")
    ap.add_argument("--aniso", default=None, metavar="SX,SY,SZ",
                    help="Fit an ANISOTROPIC (diagonal-covariance) scene: "
                         "ground truth = loaded scene with per-axis scale "
                         "multipliers; the fit recovers means AND per-axis "
                         "scales through the fused aniso kernel (BASELINE "
                         "config-4 'covariances' end-to-end).")
    ap.add_argument("--out", default=None, help="Write final render to PNG.")
    ap.add_argument("--checkpoint-dir", default=None)
    ap.add_argument("--checkpoint-every", type=int, default=100)
    args = ap.parse_args(argv)

    import jax.numpy as jnp
    import numpy as np
    import optax

    from sgrt_tpu.models.gaussians import grid_scene, scene_from_obj
    from sgrt_tpu.ops.frame import (orbit_camera, probe_buckets,
                                    probe_capacity, render_orbit_frame)
    from sgrt_tpu.parallel.fit import (init_state, make_aniso_frame_train_step,
                                       make_frame_train_step)

    scene = scene_from_obj(args.file) if args.file else grid_scene(args.grid)
    w, h = args.width, args.height

    aniso_scene = None
    if args.aniso:
        from sgrt_tpu.ops import anisotropic as an

        sf = [float(x) for x in args.aniso.split(",")]
        if len(sf) != 3:
            print("error: --aniso expects SX,SY,SZ")
            return 1
        aniso_scene = an.from_isotropic(scene).replace(
            scale=an.from_isotropic(scene).scale
            * jnp.asarray([sf], jnp.float32))
        scene = an.iso_proxy(aniso_scene)   # probing/tiling proxy

    angles = [i * 360.0 / args.views for i in range(args.views)]
    cap = max(32, int(probe_capacity(scene, angles, -4.0, 1.0, args.tiles) * 1.3))
    bucket = probe_buckets(scene, angles, -4.0, 1.0, args.tiles, margin=1.3)

    print(f"scene: {scene.n} Gaussians; {args.views} views at {w}x{h}; "
          f"capacity {cap}; {bucket}" + (" [aniso]" if args.aniso else ""))

    # targets: ground-truth renders of each orbit view
    cams, targets = [], []
    for a in angles:
        cam = orbit_camera(a, -4.0, 1.0, w, h)
        if aniso_scene is not None:
            from sgrt_tpu.ops import anisotropic as an

            img, _ = an.render_tiled_aniso(aniso_scene, cam,
                                           tiles=args.tiles, capacity=cap,
                                           backend="pallas",
                                           bucket_cfg=bucket)
        else:
            img, _ = render_orbit_frame(scene, a, width=w, height=h,
                                        tiles=args.tiles, capacity=cap,
                                        backend="pallas", bucket_cfg=bucket)
        cams.append(cam)
        targets.append(img)

    rng = np.random.default_rng(args.seed)
    opt = optax.adam(args.lr)
    if aniso_scene is not None:
        # perturb means AND per-axis scales: the fit must recover the
        # covariance structure, not just positions
        noisy = aniso_scene.replace(
            mu=aniso_scene.mu + jnp.asarray(
                rng.normal(0, args.noise, aniso_scene.mu.shape), jnp.float32),
            scale=aniso_scene.scale * jnp.asarray(
                rng.uniform(0.8, 1.25, aniso_scene.scale.shape), jnp.float32))
        trainable = tuple((args.trainable
                           or "mu,scale,magnitude,albedo").split(","))
        step = make_aniso_frame_train_step(
            opt, width=w, height=h, tiles=args.tiles, capacity=cap,
            bucket_cfg=bucket, trainable=trainable)
        truth = aniso_scene
    else:
        noisy = scene.replace(
            mu=scene.mu + jnp.asarray(
                rng.normal(0, args.noise, scene.mu.shape), jnp.float32))
        trainable = tuple((args.trainable
                           or "mu,sigma,magnitude,albedo").split(","))
        step = make_frame_train_step(
            opt, width=w, height=h, tiles=args.tiles, capacity=cap,
            bucket_cfg=bucket, trainable=trainable)
        truth = scene
    state = init_state(noisy, opt)

    mgr = None
    if args.checkpoint_dir:
        from sgrt_tpu.utils.checkpoint import make_manager, save_fit

        mgr = make_manager(args.checkpoint_dir)

    t0 = time.perf_counter()
    for i in range(args.steps):
        v = i % args.views
        cam = cams[v]
        o, dirs = cam.rays()
        state, loss, overflow = step(state, cam.view_matrix, o, dirs,
                                     targets[v])
        if (i + 1) % max(args.steps // 10, 1) == 0:
            print(f"step {i+1:5d}  view {v}  loss {float(loss):.3e}")
            if int(overflow):
                print(f"warning: step {i+1}: {int(overflow)} tiles over "
                      "capacity (gradient mass dropped) — raise capacity/"
                      "margin")
        if mgr is not None and (i + 1) % args.checkpoint_every == 0:
            save_fit(mgr, i + 1, state)
    dt = time.perf_counter() - t0
    print(f"{args.steps} steps in {dt:.1f} s "
          f"({args.steps * w * h / dt / 1e3:.1f} K rays/s fwd+bwd)")
    if mgr is not None:
        save_fit(mgr, args.steps, state)
        mgr.wait_until_finished()

    # report recovery quality
    err0 = float(jnp.abs(noisy.mu - truth.mu).max())
    err1 = float(jnp.abs(state.scene.mu - truth.mu).max())
    print(f"max |mu error|: {err0:.5f} -> {err1:.5f}")
    if aniso_scene is not None:
        s0 = float(jnp.abs(noisy.scale - truth.scale).max())
        s1 = float(jnp.abs(state.scene.scale - truth.scale).max())
        print(f"max |scale error|: {s0:.5f} -> {s1:.5f}")

    if args.out:
        from sgrt_tpu.utils.image import write_png

        if aniso_scene is not None:
            from sgrt_tpu.ops import anisotropic as an

            img, _ = an.render_tiled_aniso(state.scene, cams[0],
                                           tiles=args.tiles, capacity=cap,
                                           backend="pallas",
                                           bucket_cfg=bucket)
        else:
            img, _ = render_orbit_frame(state.scene, 0.0, width=w, height=h,
                                        tiles=args.tiles, capacity=cap,
                                        backend="pallas", bucket_cfg=bucket)
        write_png(args.out, np.asarray(img))
        print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
