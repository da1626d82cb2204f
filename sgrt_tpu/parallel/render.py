"""Multi-chip forward rendering: rays sharded over the mesh, scene replicated.

shard_map gives per-device local semantics — each chip renders its pixel
shard with zero communication (rendering is embarrassingly parallel over
rays; the only collective in the framework is the gradient psum in
parallel/fit.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from sgrt_tpu.models.camera import Camera
from sgrt_tpu.models.gaussians import GaussianScene
from sgrt_tpu.ops.render import render_rays_impl
from sgrt_tpu.parallel.mesh import RAYS_AXIS, shard_rays


def render_rays_sharded(mesh: Mesh, o, dirs, scene: GaussianScene,
                        q_block: int = 128, ray_block: int = 2048):
    """dirs (R,3) sharded on the rays axis → colors (R,3) with the same
    sharding. R must divide evenly by the mesh size."""

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(RAYS_AXIS), P()),
        out_specs=P(RAYS_AXIS),
    )
    def local_render(o, dirs_local, scene):
        return render_rays_impl(o, dirs_local, scene, q_block, ray_block)

    return local_render(o, dirs, scene)


def render_sharded(scene: GaussianScene, camera: Camera, mesh: Mesh, origin=None,
                   q_block: int = 128, ray_block: int = 2048) -> jnp.ndarray:
    """Full-frame render with rows of pixels sharded across all chips."""
    o, dirs = camera.rays(origin)
    dirs = shard_rays(mesh, dirs)
    colors = render_rays_sharded(mesh, o, dirs, scene, q_block, ray_block)
    return colors.reshape(camera.height, camera.width, 3)


def make_sharded_frame_renderer(
    mesh: Mesh,
    *,
    width: int = 256,
    height: int = 256,
    tiles: int = 16,
    capacity: int = 128,
    bucket_cfg=None,
    erf_name: str = "as5",
    exp_name: str = "exact",
    focal_length=1.0,
):
    """Multi-chip FORWARD on the production (Pallas, tiled) backend.

    Returns a jitted render(scene, view, o, dirs) → (image (H, W, 3),
    overflow scalar int32). Tiles are the sharded axis — each device runs
    the fused kernel on its tile slice (the multi-chip analog of the
    reference's thread-per-tile pool, rt.h:344-404) with the scene
    replicated and ZERO collectives (rendering is embarrassingly parallel
    over rays). With bucket_cfg, both scheduler buckets are sharded with
    the round-robin interleave of the count-sorted tile order, so every
    device carries a balanced dense/sparse mix; bucket sizes must divide
    the mesh (frame.probe_buckets(..., multiple_of=D)).

    This is the forward-only sibling of fit._make_sharded_bucketed_step:
    the flagship kernel exercised under shard_map without the train loop.
    """
    from sgrt_tpu.ops.pallas_chunked import tile_renderer_for
    from sgrt_tpu.ops.render import _tile_rays, _untile_image
    from sgrt_tpu.ops.scheduler import BucketConfig, bucketed_tile_indices
    from sgrt_tpu.ops.tiling import as_grid, gather_tiles, tile_indices

    n_dev = mesh.devices.size
    tx, ty = as_grid(tiles)
    t2 = tx * ty

    if bucket_cfg is not None and bucket_cfg.n_dense:
        cfg = bucket_cfg
        if cfg.n_dense % n_dev or (t2 - cfg.n_dense) % n_dev:
            raise ValueError(
                f"bucket sizes ({cfg.n_dense}, {t2 - cfg.n_dense}) must "
                f"divide the mesh ({n_dev} devices); size with "
                f"probe_buckets(..., multiple_of={n_dev})")
        # per-bucket routing (monolithic vs chunked) through ONE helper
        cap_d, render_dense = tile_renderer_for(cfg.cap_dense,
                                                erf_name=erf_name,
                                                exp_name=exp_name)
        cap_s, render_sparse = tile_renderer_for(cfg.cap_sparse,
                                                 erf_name=erf_name,
                                                 exp_name=exp_name)
        cfg = BucketConfig(cfg.n_dense, cap_d, cap_s)

        @functools.partial(
            jax.shard_map,
            mesh=mesh,
            in_specs=(P(),) + (P(RAYS_AXIS),) * 4 + (P(),),
            out_specs=(P(RAYS_AXIS), P(RAYS_AXIS)),
            # pallas_call outputs carry no varying-mesh-axes metadata
            check_vma=False,
        )
        def sharded_render(scene, idx_d, cnt_d, d_d, d_s_pack, o):
            idx_s, cnt_s, d_s = d_s_pack
            cd = render_dense(gather_tiles(scene, idx_d), o, d_d, cnt_d)
            cs = render_sparse(gather_tiles(scene, idx_s), o, d_s, cnt_s)
            return cd, cs

        @jax.jit
        def render(scene, view, o, dirs):
            dense_ids, idx_d, sparse_ids, idx_s, counts = bucketed_tile_indices(
                scene, view, tiles, cfg, focal_length=focal_length,
                interleave=n_dev)
            overflow = (jnp.sum(counts[sparse_ids] > cfg.cap_sparse)
                        + jnp.sum(counts[dense_ids] > cfg.cap_dense)
                        ).astype(jnp.int32)
            d = _tile_rays(dirs, height, width, tiles)
            cd, cs = sharded_render(
                scene, idx_d, counts[dense_ids], d[dense_ids],
                (idx_s, counts[sparse_ids], d[sparse_ids]), o)
            colors = jnp.zeros((t2,) + cs.shape[1:], cs.dtype)
            colors = colors.at[sparse_ids].set(cs).at[dense_ids].set(cd)
            return _untile_image(colors, height, width, tiles), overflow

        return render

    # single-capacity path: the whole tile axis sharded evenly. An adaptive
    # bucket config that chose single-launch (n_dense == 0) still carries
    # the probed capacity — honor it rather than the default kwarg, or a
    # renderer built from probe_buckets(...) alone would under-allocate
    # tile capacity and overflow.
    if bucket_cfg is not None:
        capacity = max(capacity, bucket_cfg.cap_dense)
    if t2 % n_dev:
        raise ValueError(f"tile count {t2} not divisible by mesh ({n_dev})")
    cap, _render = tile_renderer_for(capacity, erf_name=erf_name,
                                     exp_name=exp_name)

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(RAYS_AXIS), P(RAYS_AXIS), P(RAYS_AXIS), P()),
        out_specs=P(RAYS_AXIS),
        check_vma=False,
    )
    def sharded_render(scene, idx, cnt, d, o):
        return _render(gather_tiles(scene, idx), o, d, cnt)

    @jax.jit
    def render(scene, view, o, dirs):
        idx, counts = tile_indices(scene, view, tiles, cap,
                                   focal_length=focal_length)
        overflow = jnp.sum(counts > cap).astype(jnp.int32)
        d = _tile_rays(dirs, height, width, tiles)
        colors = sharded_render(scene, idx, counts, d, o)
        return _untile_image(colors, height, width, tiles), overflow

    return render
