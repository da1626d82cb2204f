"""Whole-frame jitted pipeline: orbit camera → rays → tile/cull → render.

On a tunneled TPU every eager op is a host↔device round trip, so the frame
loop must be ONE compiled call. This module fuses the reference's per-frame
sequence (main.cpp:257-335: orbit camera, re-tile, render) into a single jit
whose only dynamic input is the scene + orbit angle.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from sgrt_tpu.models.camera import Camera, orbit_position
from sgrt_tpu.models.gaussians import GaussianScene
from sgrt_tpu.ops.render import (
    _radiance_block,
    _tile_rays,
    _untile_image,
    render_rays_impl,
)
from sgrt_tpu.ops.tiling import gather_tiles, tile_indices, tile_membership


def orbit_camera(angle_deg, offset, focal_length, width: int, height: int) -> Camera:
    """Camera on the reference's orbit (main.cpp:248-255, 330-334): start at
    (0, 0, offset) yaw=-90, rotated `angle_deg` about world Y. Traceable."""
    base = jnp.array([0.0, 0.0, 1.0], jnp.float32) * offset
    pos = orbit_position(base, angle_deg)
    cam = Camera(
        position=pos,
        front=jnp.array([0.0, 0.0, 1.0], jnp.float32),
        up=jnp.array([0.0, 1.0, 0.0], jnp.float32),
        right=jnp.zeros(3, jnp.float32),
        world_up=jnp.array([0.0, 1.0, 0.0], jnp.float32),
        view_matrix=jnp.eye(4, dtype=jnp.float32),
        focal_length=jnp.asarray(focal_length, jnp.float32),
        width=width,
        height=height,
    )
    return cam.turn(-90.0 - angle_deg, 0.0)


_FRAME_STATICS = ("width", "height", "tiles", "capacity", "q_block",
                  "ray_block", "tile_batch", "use_tiling", "backend",
                  "erf_name", "exp_name", "bucket_cfg")


def _render_orbit_frame_impl(
    scene: GaussianScene,
    angle_deg,
    offset=-4.0,
    focal_length=1.0,
    *,
    width: int = 256,
    height: int = 256,
    tiles: int = 16,
    capacity: int = 128,
    q_block: int = 128,
    ray_block: int = 2048,
    tile_batch: int = 16,
    use_tiling: bool = True,
    backend: str = "xla",
    erf_name: str = "as5",
    exp_name: str = "exact",
    bucket_cfg=None,
):
    """One full frame → (image (H,W,3), overflow (scalar int32)).

    overflow counts tiles whose true member count exceeded their capacity
    (Gaussians silently dropped) — 0 means the frame is exact. It is always
    0 for the untiled path. The reference never truncates (per-tile
    std::vector, rt.cpp:64), so a nonzero overflow is a sizing error the
    caller must surface. backend="pallas" routes the hot erf reduction
    through the fused Pallas kernel (ops.pallas_kernel); "xla" uses the
    pure-jnp formulation (ops.render). erf_name/exp_name select the
    approximation on BOTH backends (the reference templates every render
    path over Exp/Erf, rt.h:22-23); "exact" on the Pallas backend means the
    f32-exact as5.
    """
    cam = orbit_camera(angle_deg, offset, focal_length, width, height)
    o, dirs = cam.rays()
    if not use_tiling:
        if backend == "pallas":
            from sgrt_tpu.ops.pallas_kernel import render_rays_pallas_impl

            colors = render_rays_pallas_impl(o, dirs, scene, erf_name=erf_name,
                                             exp_name=exp_name)
        else:
            colors = render_rays_impl(o, dirs, scene, q_block, ray_block,
                                      erf_name=erf_name, exp_name=exp_name)
        return colors.reshape(height, width, 3), jnp.zeros((), jnp.int32)

    if backend == "pallas" and bucket_cfg is not None:
        from sgrt_tpu.ops.scheduler import render_tiles_bucketed

        d = _tile_rays(dirs, height, width, tiles)
        colors, counts, overflow = render_tiles_bucketed(
            scene, cam.view_matrix, o, d, bucket_cfg, erf_name=erf_name,
            exp_name=exp_name, tiles=tiles, focal_length=focal_length)
        return _untile_image(colors, height, width, tiles), overflow

    if backend == "pallas":
        from sgrt_tpu.ops.pallas_chunked import tile_renderer_for

        d = _tile_rays(dirs, height, width, tiles)
        # one routing point: monolithic fused kernel, or the Gaussian-axis
        # chunked kernel above its ceiling (dense scenes)
        capacity, render_tiles = tile_renderer_for(capacity,
                                                   erf_name=erf_name,
                                                   exp_name=exp_name)
        idx, counts = tile_indices(scene, cam.view_matrix, tiles, capacity,
                                   focal_length=focal_length)
        colors = render_tiles(gather_tiles(scene, idx), o, d, counts)
        overflow = jnp.sum(counts > capacity).astype(jnp.int32)
        return _untile_image(colors, height, width, tiles), overflow

    # Static normalization: capacity must divide evenly into q-blocks.
    qb = min(q_block, capacity)
    capacity = -(-capacity // qb) * qb
    idx, counts = tile_indices(scene, cam.view_matrix, tiles, capacity,
                               focal_length=focal_length)
    tiled = gather_tiles(scene, idx)
    d = _tile_rays(dirs, height, width, tiles)
    from sgrt_tpu.ops.tiling import as_grid

    tx_, ty_ = as_grid(tiles)
    t2 = tx_ * ty_

    tb = min(tile_batch, t2)

    def one_tile(args):
        tile_scene, tile_dirs = args
        return _radiance_block(o, tile_dirs, tile_scene, qb, erf_name,
                               exp_name)

    chunked = jax.tree_util.tree_map(
        lambda a: a.reshape(t2 // tb, tb, *a.shape[1:]), (tiled, d)
    )
    colors = jax.lax.map(jax.vmap(one_tile), chunked).reshape(t2, -1, 3)
    overflow = jnp.sum(counts > capacity).astype(jnp.int32)
    return _untile_image(colors, height, width, tiles), overflow


render_orbit_frame = jax.jit(_render_orbit_frame_impl,
                             static_argnames=_FRAME_STATICS)


def render_orbit_frames(scene: GaussianScene, angles, offset=-4.0,
                        focal_length=1.0, **cfg):
    """Render a whole orbit sequence → (imgs (F, H, W, 3), overflow scalar
    summed over frames). Per-frame re-tiling, same work per frame as
    render_orbit_frame (the reference's frame loop, main.cpp:257-335).

    Frames are dispatched without intermediate host syncs, so device
    execution pipelines behind the dispatch loop; only the final stack
    forces completion. (Measured on the TPU: a lax.scan-over-frames variant
    was NOT faster — pipelined dispatch already hides per-call overhead,
    4.53 vs 4.40 ms/frame on the cube orbit — and cost minutes of extra
    compile.)
    """
    angles = jnp.asarray(angles, jnp.float32)
    imgs, ovfs = [], []
    for i in range(angles.shape[0]):
        im, o = render_orbit_frame(scene, angles[i], offset, focal_length,
                                   **cfg)
        imgs.append(im)
        ovfs.append(o)
    return jnp.stack(imgs, axis=0), jnp.sum(jnp.stack(ovfs))


_BATCH_STATICS = ("width", "height", "tiles", "capacity", "n_frames",
                  "erf_name", "exp_name", "bucket_cfg")


@functools.partial(jax.jit, static_argnames=_BATCH_STATICS)
def _render_orbit_batch_impl(scene, angles, offset=-4.0, focal_length=1.0, *,
                             width: int, height: int, tiles, capacity: int,
                             n_frames: int, erf_name: str = "as5",
                             exp_name: str = "exact", bucket_cfg=None):
    """F orbit frames in ONE (or two, bucketed) kernel launches: the tile
    axis is batched ACROSS frames (B = F * T2). Per-frame re-tiling still
    happens (the reference re-tiles every frame, main.cpp:263); only the
    LAUNCHES fuse. Needs per-tile camera origins — render_tiles_pallas
    takes o as (B, 3).

    Measured effect on this rig (docs/EFFICIENCY.md): parity-exact but NO
    speedup over the per-frame loop (cube 4.8 vs 4.4 ms/frame) — the
    per-frame path's dispatch overlaps device compute via pipelined
    dispatch, and the xprof trace shows the cube frame is 92.6% kernel
    time, so there is no launch overhead left to amortize. Kept because
    the measurement settles the round-3/4 "dispatch-bound" hypothesis and
    the batched form is the right shape for rigs where dispatch does not
    pipeline."""
    from sgrt_tpu.ops.pallas_chunked import tile_renderer_for
    from sgrt_tpu.ops.tiling import as_grid

    tx, ty = as_grid(tiles)
    t2 = tx * ty

    if bucket_cfg is not None and not bucket_cfg.n_dense:
        capacity = max(capacity, bucket_cfg.cap_dense)
        bucket_cfg = None

    if bucket_cfg is None:
        cap, render_tiles = tile_renderer_for(capacity, erf_name=erf_name,
                                              exp_name=exp_name)
        idxs, cnts, ds, origins = [], [], [], []
        for f in range(n_frames):
            cam = orbit_camera(angles[f], offset, focal_length, width,
                               height)
            o, dirs = cam.rays()
            idx, cnt = tile_indices(scene, cam.view_matrix, tiles, cap,
                                    focal_length=focal_length)
            idxs.append(idx)
            cnts.append(cnt)
            ds.append(_tile_rays(dirs, height, width, tiles))
            origins.append(jnp.broadcast_to(o, (t2, 3)))
        idx = jnp.concatenate(idxs)
        counts = jnp.concatenate(cnts)
        d = jnp.concatenate(ds)
        o_b = jnp.concatenate(origins)
        colors = render_tiles(gather_tiles(scene, idx), o_b, d, counts)
        overflow = jnp.sum(counts > cap).astype(jnp.int32)
        imgs = jnp.stack([
            _untile_image(colors[f * t2:(f + 1) * t2], height, width, tiles)
            for f in range(n_frames)])
        return imgs, overflow

    # bucketed: one dense + one sparse launch across ALL frames
    from sgrt_tpu.ops.scheduler import BucketConfig, bucketed_tile_indices

    cfg = bucket_cfg
    cap_d, render_dense = tile_renderer_for(cfg.cap_dense, erf_name=erf_name,
                                            exp_name=exp_name)
    cap_s, render_sparse = tile_renderer_for(cfg.cap_sparse,
                                             erf_name=erf_name,
                                             exp_name=exp_name)
    cfg = BucketConfig(cfg.n_dense, cap_d, cap_s)
    per = {"idx_d": [], "cnt_d": [], "d_d": [], "o_d": [], "ids_d": [],
           "idx_s": [], "cnt_s": [], "d_s": [], "o_s": [], "ids_s": []}
    overflow = jnp.zeros((), jnp.int32)
    for f in range(n_frames):
        cam = orbit_camera(angles[f], offset, focal_length, width, height)
        o, dirs = cam.rays()
        dense_ids, idx_d, sparse_ids, idx_s, counts = bucketed_tile_indices(
            scene, cam.view_matrix, tiles, cfg, focal_length=focal_length)
        overflow += (jnp.sum(counts[sparse_ids] > cfg.cap_sparse)
                     + jnp.sum(counts[dense_ids] > cfg.cap_dense)
                     ).astype(jnp.int32)
        d = _tile_rays(dirs, height, width, tiles)
        per["idx_d"].append(idx_d)
        per["cnt_d"].append(counts[dense_ids])
        per["d_d"].append(d[dense_ids])
        per["o_d"].append(jnp.broadcast_to(o, (cfg.n_dense, 3)))
        per["ids_d"].append(dense_ids)
        per["idx_s"].append(idx_s)
        per["cnt_s"].append(counts[sparse_ids])
        per["d_s"].append(d[sparse_ids])
        per["o_s"].append(jnp.broadcast_to(o, (t2 - cfg.n_dense, 3)))
        per["ids_s"].append(sparse_ids)
    cat = {k: jnp.concatenate(v) for k, v in per.items() if k[:3] != "ids"}
    colors_d = render_dense(gather_tiles(scene, cat["idx_d"]), cat["o_d"],
                            cat["d_d"], cat["cnt_d"])
    colors_s = render_sparse(gather_tiles(scene, cat["idx_s"]), cat["o_s"],
                             cat["d_s"], cat["cnt_s"])
    nd, ns = cfg.n_dense, t2 - cfg.n_dense
    imgs = []
    for f in range(n_frames):
        colors = jnp.zeros((t2,) + colors_s.shape[1:], colors_s.dtype)
        colors = colors.at[per["ids_s"][f]].set(colors_s[f * ns:(f + 1) * ns])
        colors = colors.at[per["ids_d"][f]].set(colors_d[f * nd:(f + 1) * nd])
        imgs.append(_untile_image(colors, height, width, tiles))
    return jnp.stack(imgs), overflow


def render_orbit_frames_batched(scene: GaussianScene, angles, offset=-4.0,
                                focal_length=1.0, *, batch_frames: int = 8,
                                **cfg):
    """Orbit sequence with cross-frame tile batching: frames render in
    batches of `batch_frames`, each batch ONE kernel launch (two when
    bucketed) — the small-scene efficiency path (amortizes the dispatch
    floor the per-frame loop pays; see _render_orbit_batch_impl). The
    trailing partial batch pads with repeated angles and drops the extra
    frames, so every batch reuses one compiled executable.

    Returns (imgs (F, H, W, 3), overflow summed over frames)."""
    angles = jnp.asarray(angles, jnp.float32)
    f_total = angles.shape[0]
    bf = max(1, min(batch_frames, f_total))
    imgs, ovf = [], jnp.zeros((), jnp.int32)
    for s in range(0, f_total, bf):
        batch = angles[s:s + bf]
        pad = bf - batch.shape[0]
        if pad:
            batch = jnp.concatenate([batch, jnp.repeat(batch[-1:], pad)])
        im, o = _render_orbit_batch_impl(scene, batch, offset, focal_length,
                                         n_frames=bf, **cfg)
        imgs.append(im[: bf - pad])
        ovf = ovf + o
    return jnp.concatenate(imgs, axis=0), ovf


@functools.partial(jax.jit, static_argnames=("tiles",))
def _probe_one(scene: GaussianScene, angle, offset, focal_length, tiles):
    cam = orbit_camera(angle, offset, focal_length, 8, 8)
    member = tile_membership(scene, cam.view_matrix, tiles,
                             focal_length=focal_length)
    return jnp.max(jnp.sum(member, axis=-1))


def probe_capacity(scene: GaussianScene, angles, offset, focal_length, tiles):
    """Max per-tile Gaussian count over sample orbit angles, to size
    `capacity` for a whole orbit. One compile, len(angles) tiny device calls
    (vmapping the camera chain triggers a pathological TPU compile)."""
    return max(
        int(_probe_one(scene, float(a), offset, focal_length, tiles))
        for a in angles
    )


def auto_tile_grid(scene: GaussianScene, angles, offset, focal_length,
                   start=(16, 32), margin: float = 1.3,
                   width: int | None = None, height: int | None = None,
                   min_rays_per_tile: int = 32):
    """Smallest power-of-two refinement of `start` whose worst per-tile
    count (x margin) fits the backward kernel's VMEM ceiling
    (pallas_kernel.MAX_BWD_CAPACITY) — the fitting-scale sizing rule:
    denser scenes need finer grids because per-tile cost is count^2 and
    the kernel's Gaussian axis is VMEM-bounded. Returns ((tx, ty), cap).

    width/height bound the refinement by rays per tile: rays are the
    kernel's 128-wide LANE axis, so tiles below ~32 rays waste most of the
    machine to lane padding AND blow up every (B, N, rays) buffer 128/rays
    times in its padded layout (measured at 50k Gaussians: an 8-ray grid
    turned a 0.5 GB saved-T residual into a 9.4 GB padded allocation).

    Capacities above pallas_kernel.MAX_BWD_CAPACITY route to the CHUNKED
    kernel (ops.pallas_chunked), so refinement past that point trades
    chunk count against lane waste: once tiles are down to one full
    128-ray lane block, refining further only pads lanes — stop there if
    the chunked ceiling covers the capacity. Refinement also stops at
    min_rays_per_tile even if cap stays above every ceiling — callers must
    then raise the resolution or shard the scene.
    """
    from sgrt_tpu.ops.pallas_chunked import MAX_CHUNKED_CAPACITY
    from sgrt_tpu.ops.pallas_kernel import MAX_BWD_CAPACITY
    from sgrt_tpu.ops.tiling import as_grid

    tx, ty = as_grid(start)
    while True:
        cap = max(64, int(probe_capacity(scene, angles, offset, focal_length,
                                         (tx, ty)) * margin))
        if cap <= MAX_BWD_CAPACITY or tx * ty >= 8192:
            return (tx, ty), cap
        rays_now = None
        if width is not None and height is not None:
            rays_now = (width // tx) * (height // ty)
        if (rays_now is not None and rays_now <= 128
                and cap <= MAX_CHUNKED_CAPACITY):
            # chunked kernel handles the capacity; refining below one full
            # lane block would only pad lanes (full-lane tiles + chunking
            # beat lane-starved tiles — measured, docs/LARGE_N.md)
            return (tx, ty), cap
        nxt = (tx * 2, ty) if tx <= ty else (tx, ty * 2)
        if width is not None and height is not None:
            rays = (width // nxt[0]) * (height // nxt[1])
            if rays < min_rays_per_tile:
                return (tx, ty), cap
        tx, ty = nxt


def probe_buckets(scene: GaussianScene, angles, offset, focal_length,
                  tiles, margin: float = 1.2, dense_frac: float = 0.125,
                  multiple_of: int = 1):
    """Host helper: size a BucketConfig over sample orbit angles (the
    bucketed analog of probe_capacity). multiple_of: mesh size the buckets
    must split evenly over (see probe_bucket_config)."""
    from sgrt_tpu.ops.scheduler import probe_bucket_config

    views = [
        orbit_camera(float(a), offset, focal_length, 8, 8).view_matrix
        for a in angles
    ]
    return probe_bucket_config(scene, views, tiles, margin=margin,
                               dense_frac=dense_frac,
                               focal_length=focal_length,
                               multiple_of=multiple_of)
