"""Fitting-scale envelope — tiling/gather/kernel cost at 10k-100k Gaussians.

The reference only ever tiled N <= 3,644 (teapot); a fitting framework goes
to 50k-100k immediately. Two stages have superlinear cost in N:

  - tile_membership: dense (T2, N) matrix — O(T2*N), same asymptotics as
    the reference's tile_gaussians (rt.cpp:29-69) but one XLA fusion;
  - gather_tiles: one-hot MXU gather is O(rows * N) MACs, so past
    tiling.ONEHOT_MAX_SCENE_ROWS it switches to the native DMA gather
    (O(rows)); this script is the measurement behind that threshold.

Procedural scene: N points on a sphere surface (the obj-loader sigma
heuristic for >=1000 vertices, sigma=0.05), orbit camera, 256x256.

Run on the TPU: python scripts/large_n.py [--n 10000 50000 100000]
Writes one JSON line per (N, stage). Appends nothing; copy results into
docs/EFFICIENCY.md by hand (they are hardware numbers).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def sphere_scene(n: int):
    import jax.numpy as jnp

    from sgrt_tpu.models.gaussians import GaussianScene

    rng = np.random.default_rng(0)
    v = rng.normal(size=(n, 3)).astype(np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    albedo = 0.5 * v + 0.5                     # the obj-loader albedo rule
    return GaussianScene(
        mu=jnp.asarray(v),
        sigma=jnp.full((n,), 0.05, jnp.float32),   # >=1000-vertex heuristic
        magnitude=jnp.ones((n,), jnp.float32),
        albedo=jnp.asarray(albedo),
    )


def fetch_time(f, n_iter=10, warmup=1, sync_each=False):
    """sync_each: block per call instead of pipelining the whole loop —
    required when f's output is large (at fitting scale a gathered tile
    pytree is ~1 GB, and 10+ pipelined in-flight outputs exhaust HBM)."""
    import jax
    import jax.numpy as jnp

    for _ in range(warmup):
        r = f()
    float(jnp.sum(jax.tree_util.tree_leaves(r)[0]))
    t0 = time.perf_counter()
    for _ in range(n_iter):
        r = f()
        if sync_each:
            jax.block_until_ready(r)
    float(jnp.sum(jax.tree_util.tree_leaves(r)[0]))
    return (time.perf_counter() - t0) / n_iter


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, nargs="+",
                    default=[10_000, 50_000, 100_000])
    ap.add_argument("--res", type=int, default=256)
    ap.add_argument("--tiles", default="auto",
                    help="'auto' picks a grid fine enough that per-tile "
                         "counts fit the backward VMEM ceiling "
                         "(pallas_kernel.MAX_BWD_CAPACITY)")
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--aniso", action="store_true",
                    help="anisotropic scene (per-axis scales 2:1:0.5 of "
                         "the isotropic sigma) through the chunked aniso "
                         "kernel")
    args = ap.parse_args()

    if len(args.n) > 1:
        # one subprocess per scene size: the tunneled runtime does not
        # reliably release HBM between sizes within one process (observed
        # RESOURCE_EXHAUSTED at the second N even after jax.clear_caches)
        import subprocess

        for n in args.n:
            subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--n", str(n),
                 "--res", str(args.res), "--tiles", args.tiles,
                 "--steps", str(args.steps)]
                + (["--aniso"] if args.aniso else []),
                check=False)
        return

    import jax
    import jax.numpy as jnp
    import optax

    import sgrt_tpu.ops.tiling as tiling
    from sgrt_tpu.ops.frame import (orbit_camera, probe_buckets,
                                    probe_capacity, render_orbit_frame)
    from sgrt_tpu.ops.tiling import gather_tiles, tile_indices
    from sgrt_tpu.parallel.fit import (init_state, make_frame_train_step,
                                       make_slab_frame_train_step)

    res = args.res
    print(f"device: {jax.devices()[0]}")

    from sgrt_tpu.ops.frame import auto_tile_grid

    for n in args.n:
        scene = sphere_scene(n)
        if args.aniso:
            # stretched per-axis scales; culling/probing on the max-scale
            # proxy — exercises ops/pallas_chunked_aniso at fitting scale
            from sgrt_tpu.ops import anisotropic as an

            ascene = an.from_isotropic(scene)
            ascene = ascene.replace(scale=ascene.scale * jnp.asarray(
                [[2.0, 1.0, 0.5]], jnp.float32))
            scene = an.iso_proxy(ascene)
        if args.tiles == "auto":
            tiles, cap = auto_tile_grid(scene, [30.0], -4.0, 1.0,
                                        margin=1.2, width=res, height=res)
        else:
            tiles = tuple(int(v) for v in args.tiles.split("x"))
            cap = max(64, int(probe_capacity(scene, [30.0], -4.0, 1.0,
                                             tiles) * 1.2))
        cam = orbit_camera(30.0, -4.0, 1.0, res, res)
        o, dirs = cam.rays()
        # no 4096 clamp any more: capacities above the monolithic VMEM
        # ceiling route to the Gaussian-axis chunked kernel
        # (ops.pallas_chunked) in every production path
        cap_r = -(-cap // 128) * 128
        row = {"n": n, "res": res, "tiles": tiles, "capacity": cap_r}

        # frame + train step run FIRST (they need the most free HBM; the
        # gather micro-timings below leave buffers this runtime does not
        # reliably release, which starved these stages when run after)
        bc = probe_buckets(scene, [30.0], -4.0, 1.0, tiles, margin=1.2)
        row["buckets"] = tuple(bc)

        if args.aniso:
            row["aniso"] = True

            def fwd():
                img, ovf = an.render_tiled_aniso(
                    ascene, cam, tiles=tiles, capacity=cap_r,
                    backend="pallas", bucket_cfg=bc)
                return img
        else:
            def fwd():
                img, ovf = render_orbit_frame(
                    scene, 30.0, -4.0, 1.0, width=res, height=res,
                    tiles=tiles, capacity=cap_r, backend="pallas",
                    bucket_cfg=bc)
                return img

        row["fwd_frame_ms"] = fetch_time(fwd, n_iter=5) * 1e3

        # stage 4: full train step. The tunneled runtime kills device
        # programs past ~60-90 s (measured with a plain XLA loop, see
        # fit.make_slab_frame_train_step), so when the probed erf work
        # predicts a step beyond ~40 s the step runs as host-level slabs —
        # one bounded program per count-sorted tile slab, gradients
        # accumulated (exact).
        from sgrt_tpu.ops.tiling import as_grid, tile_membership

        opt = optax.adam(1e-3)
        counts_np = np.sort(np.asarray(jnp.sum(tile_membership(
            scene, cam.view_matrix, tiles, focal_length=1.0), axis=-1))
        )[::-1].astype(np.float64)
        tx_, ty_ = as_grid(tiles)
        rays_pad = max(128, (res // tx_) * (res // ty_))
        kern_rate = 124e9        # measured fwd erf/s plateau (EFFICIENCY.md)
        step_s = 3.3 * 5 * (counts_np ** 2).sum() * rays_pad / kern_rate
        row["est_step_s"] = round(step_s, 1)
        if args.aniso and step_s > 40.0:
            # fitting-scale aniso: host-slabbed programs (aniso=True slab
            # step), exactly as the isotropic route below
            t2 = tx_ * ty_
            slab = 8
            for cand in sorted({d for d in range(8, t2 + 1) if t2 % d == 0}):
                worst = max(
                    3.3 * 5 * (counts_np[i:i + cand] ** 2).sum() * rays_pad
                    / kern_rate
                    for i in range(0, t2, cand))
                if worst <= 25.0:
                    slab = cand
                else:
                    break
            row["slab_tiles"] = slab
            step = make_slab_frame_train_step(
                opt, width=res, height=res, tiles=tiles, capacity=cap_r,
                slab_tiles=slab, aniso=True)
        elif args.aniso:
            from sgrt_tpu.parallel.fit import make_aniso_frame_train_step

            step = make_aniso_frame_train_step(
                opt, width=res, height=res, tiles=tiles, capacity=cap_r,
                bucket_cfg=bc)
        elif step_s > 40.0:
            t2 = tx_ * ty_
            slab = 8
            for cand in sorted({d for d in range(8, t2 + 1) if t2 % d == 0}):
                worst = max(
                    3.3 * 5 * (counts_np[i:i + cand] ** 2).sum() * rays_pad
                    / kern_rate
                    for i in range(0, t2, cand))
                if worst <= 25.0:
                    slab = cand
                else:
                    break
            row["slab_tiles"] = slab
            step = make_slab_frame_train_step(
                opt, width=res, height=res, tiles=tiles, capacity=cap_r,
                slab_tiles=slab)
        else:
            step = make_frame_train_step(opt, width=res, height=res,
                                         tiles=tiles, capacity=cap_r,
                                         backend="pallas", bucket_cfg=bc)
        state = init_state(ascene if args.aniso else scene, opt)
        target = jnp.zeros((res, res, 3), jnp.float32)
        state, loss, ovf = step(state, cam.view_matrix, o, dirs, target)
        assert int(ovf) == 0, f"overflow at n={n}"
        float(loss)
        t0 = time.perf_counter()
        for _ in range(args.steps):
            state, loss, ovf = step(state, cam.view_matrix, o, dirs, target)
        float(loss)
        row["train_step_ms"] = (time.perf_counter() - t0) / args.steps * 1e3
        row["rays_per_s_fwdbwd"] = round(res * res / (row["train_step_ms"] / 1e3))
        del state, step, target
        jax.clear_caches()

        # gather micro-timings LAST: membership+compaction, then the two
        # gather strategies (the one-hot is O(rows * N) MACs — at 50k+ it
        # is minutes per frame, so only the native path is timed there)
        @jax.jit
        def ti(s):
            return tile_indices(s, cam.view_matrix, tiles, cap_r)[0]

        row["tile_indices_ms"] = fetch_time(lambda: ti(scene),
                                            sync_each=True) * 1e3
        idx = ti(scene)
        saved = tiling.ONEHOT_MAX_SCENE_ROWS
        strategies = [("gather_native_ms", 0)]
        if n <= 20_000:
            strategies.append(("gather_onehot_ms", 1 << 30))
        for name, thresh in strategies:
            tiling.ONEHOT_MAX_SCENE_ROWS = thresh
            g = jax.jit(lambda s, i: gather_tiles(s, i).mu)
            try:
                row[name] = fetch_time(lambda: g(scene, idx),
                                       sync_each=True) * 1e3
            except Exception as e:  # OOM at large N is a result, not a crash
                row[name] = f"failed: {type(e).__name__}"
        tiling.ONEHOT_MAX_SCENE_ROWS = saved

        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
