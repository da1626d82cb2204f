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
