"""Differentiable scene fitting — the framework's training loop.

NEW capability vs the forward-only reference (SURVEY §0: "no backward pass
anywhere in the reference"): optimize Gaussian means / sigmas / magnitudes /
albedos against target pixels by gradient descent (optax), with rays sharded
across chips and parameter gradients all-reduced (psum) over ICI — the
north-star configuration of BASELINE.json.

Design: shard_map over a 1-D "rays" mesh; each device computes loss +
gradients on its pixel shard; `jax.lax.pmean` inside the shard_map produces
the ICI all-reduce. Parameters are replicated; the optimizer step is
identical on every device. Collective scheduling is MEASURED, not assumed
(docs/OVERLAP.md, scripts/overlap.py): XLA combines the per-field pmeans
into one variadic all-reduce whose payload is the N*8-float scene pytree
(~KiB) — microseconds on ICI against a multi-ms backward, so backward/
all-reduce overlap is immaterial at renderer scale and combining (fewer
launches) is the right schedule.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P

from sgrt_tpu.models.gaussians import GaussianScene
from sgrt_tpu.ops.render import render_rays_impl
from sgrt_tpu.parallel.mesh import RAYS_AXIS


class FitState(NamedTuple):
    scene: GaussianScene
    opt_state: Any
    step: jnp.ndarray



def _apply_updates(optimizer, grads, opt_state, scene):
    """Optimizer update under a named trace scope (docs/TRACE.md)."""
    with jax.named_scope("optimizer"):
        updates, opt_state = optimizer.update(grads, opt_state, scene)
        return optax.apply_updates(scene, updates), opt_state

def l2_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((pred - target) ** 2)


def make_train_step(
    optimizer: optax.GradientTransformation,
    mesh: Mesh | None = None,
    loss_fn: Callable = l2_loss,
    q_block: int = 128,
    ray_block: int = 2048,
    trainable: tuple[str, ...] = ("mu", "sigma", "magnitude", "albedo"),
    backend: str = "xla",
):
    """Build a jitted train step: (state, o, dirs, target) → (state, loss).

    mesh=None → single-device step. With a mesh, dirs/target must be sharded
    on the rays axis (parallel.mesh.shard_rays) and their length divisible by
    the mesh size. backend="pallas" routes the forward+backward through the
    fused kernel's custom VJP (ops.pallas_kernel).
    """

    def local_loss(scene, o, dirs, target):
        if backend == "pallas":
            from sgrt_tpu.ops.pallas_kernel import render_rays_pallas_impl

            colors = render_rays_pallas_impl(o, dirs, scene)
        else:
            colors = render_rays_impl(o, dirs, scene, q_block, ray_block)
        return loss_fn(colors, target)

    def value_and_grad(scene, o, dirs, target):
        def masked(scene_):
            # Freeze non-trainable fields by re-inserting stopped gradients.
            fields = {
                f: (getattr(scene_, f) if f in trainable
                    else jax.lax.stop_gradient(getattr(scene_, f)))
                for f in ("mu", "sigma", "magnitude", "albedo")
            }
            return local_loss(GaussianScene(**fields), o, dirs, target)

        return jax.value_and_grad(masked)(scene)

    if mesh is not None:
        @functools.partial(
            jax.shard_map,
            mesh=mesh,
            in_specs=(P(), P(), P(RAYS_AXIS), P(RAYS_AXIS)),
            out_specs=(P(), P()),
        )
        def sharded_vg(scene, o, dirs, target):
            loss, grads = value_and_grad(scene, o, dirs, target)
            # Gradient all-reduce over ICI (~KiB payload; see module
            # docstring + docs/OVERLAP.md for the measured schedule).
            grads = jax.lax.pmean(grads, RAYS_AXIS)
            loss = jax.lax.pmean(loss, RAYS_AXIS)
            return loss, grads

        vg = sharded_vg
    else:
        vg = value_and_grad

    @jax.jit
    def train_step(state: FitState, o, dirs, target):
        loss, grads = vg(state.scene, o, dirs, target)
        scene, opt_state = _apply_updates(optimizer, grads,
                                          state.opt_state, state.scene)
        return FitState(scene, opt_state, state.step + 1), loss

    return train_step


def init_state(scene: GaussianScene, optimizer: optax.GradientTransformation,
               mesh: Mesh | None = None) -> FitState:
    # Copy the scene leaves: train steps donate the state (donate_argnums),
    # and donating buffers aliased to the caller's scene would silently
    # invalidate the caller's arrays after the first step.
    #
    # With a mesh, place the state replicated over it FROM THE START. A
    # mesh step's output state carries NamedSharding(mesh, P()); feeding a
    # single-device state into call 1 therefore recompiles the whole step
    # at call 2 when the sharding changes (measured on the TPU: a silent
    # extra ~30 s compile of the teapot step hidden inside the timing
    # loop). One placement here → one compile.
    scene = jax.tree_util.tree_map(jnp.array, scene)
    state = FitState(scene, optimizer.init(scene), jnp.zeros((), jnp.int32))
    if mesh is not None:
        from jax.sharding import NamedSharding

        state = jax.device_put(state, NamedSharding(mesh, P()))
    return state


def _check_bwd_capacity(capacity, bucket_cfg, backend):
    """Fail at build time, not with a 40 s compile-then-VMEM-OOM. Capacities
    up to pallas_kernel.MAX_BWD_CAPACITY use the monolithic fused kernel;
    above it the train steps route to the Gaussian-axis CHUNKED kernel
    (ops.pallas_chunked) whose own ceiling is MAX_CHUNKED_CAPACITY —
    only beyond that is the grid truly too coarse for the scene."""
    if backend != "pallas":
        return
    from sgrt_tpu.ops.pallas_chunked import MAX_CHUNKED_CAPACITY

    caps = [capacity]
    if bucket_cfg is not None:
        caps += [bucket_cfg.cap_dense, bucket_cfg.cap_sparse]
    worst = max(caps)
    if worst > MAX_CHUNKED_CAPACITY:
        raise ValueError(
            f"per-tile capacity {worst} exceeds even the chunked backward "
            f"kernel's ceiling ({MAX_CHUNKED_CAPACITY}); use a finer tile "
            "grid so fewer Gaussians land in each tile (scripts/large_n.py "
            "measures this envelope)")


def _xla_tile_render(tiled, o, d, q_block: int, tile_batch: int):
    """Chunked per-tile render on the XLA backend: lax.map over tile
    batches bounds the (tb, P, qb, 5K) pairwise intermediate — a plain
    vmap over every tile OOMs at 512+ resolutions (measured: 42 GB HBM
    request for the teapot at 512^2)."""
    from sgrt_tpu.ops.render import _radiance_block

    t2 = d.shape[0]
    tb = min(tile_batch, t2)
    while t2 % tb:
        tb -= 1
    # q_block must divide the tile capacity (K) for the q-block scan
    k = tiled.sigma.shape[1]
    q_block = min(q_block, k)
    while k % q_block:
        q_block -= 1

    # checkpoint per tile: without it the backward of the chunked map saves
    # every chunk's scan residuals — O(T2 * rays * 5K) in HBM (measured
    # 32 GB for the teapot at 512^2). Rematerializing keeps residuals at
    # the gathered tile inputs.
    @jax.checkpoint
    def one_tile(args):
        tile_scene, tile_dirs = args
        return _radiance_block(o, tile_dirs, tile_scene, q_block)

    chunked = jax.tree_util.tree_map(
        lambda a: a.reshape(t2 // tb, tb, *a.shape[1:]), (tiled, d))
    return jax.lax.map(jax.vmap(one_tile), chunked).reshape(t2, -1, 3)


def make_frame_value_and_grad(
    *,
    width: int = 256,
    height: int = 256,
    tiles: int = 16,
    capacity: int = 128,
    backend: str = "pallas",
    erf_name: str = "as5",
    exp_name: str = "exact",
    trainable: tuple[str, ...] = ("mu", "sigma", "magnitude", "albedo"),
    bucket_cfg=None,
    focal_length=1.0,
    q_block: int = 128,
    tile_batch: int = 16,
):
    """Single-device frame loss+gradient: vg(scene, view, o, dirs, target)
    → ((loss, overflow), grads). The gradient core of make_frame_train_step,
    exposed so callers (verify_tpu, tests) can compare raw gradients across
    backends without an optimizer in the loop. Unjitted; jit at the call
    site."""
    from sgrt_tpu.ops.pallas_kernel import _block_sizes
    from sgrt_tpu.ops.render import _tile_rays
    from sgrt_tpu.ops.tiling import gather_tiles, tile_indices

    _check_bwd_capacity(capacity, bucket_cfg, backend)
    if backend == "pallas":
        # ONE routing point (monolithic vs Gaussian-axis chunked kernel)
        from sgrt_tpu.ops.pallas_chunked import tile_renderer_for

        capacity, _render = tile_renderer_for(capacity, erf_name=erf_name,
                                              exp_name=exp_name)
    else:
        _, qb = _block_sizes(capacity)
        capacity = -(-capacity // qb) * qb

    def masked_scene(scene):
        fields = {
            f: (getattr(scene, f) if f in trainable
                else jax.lax.stop_gradient(getattr(scene, f)))
            for f in ("mu", "sigma", "magnitude", "albedo")
        }
        return GaussianScene(**fields)

    def tile_render(scene, idx, counts, o, d):
        tiled = gather_tiles(scene, idx)
        if backend == "pallas":
            return _render(tiled, o, d, counts)
        return _xla_tile_render(tiled, o, d, min(q_block, capacity),
                                tile_batch)

    if bucket_cfg is not None and backend == "pallas":
        from sgrt_tpu.ops.scheduler import render_tiles_bucketed

        def vg(scene, view, o, dirs, target):
            d = _tile_rays(dirs, height, width, tiles)
            target_t = _tile_rays(target.reshape(-1, 3), height, width, tiles)

            def f(s):
                colors, _, overflow = render_tiles_bucketed(
                    masked_scene(s), view, o, d, bucket_cfg,
                    erf_name=erf_name, exp_name=exp_name, tiles=tiles,
                    focal_length=focal_length)
                return jnp.mean((colors - target_t) ** 2), overflow

            return jax.value_and_grad(f, has_aux=True)(scene)

        return vg

    def vg(scene, view, o, dirs, target):
        idx, counts = tile_indices(scene, view, tiles, capacity,
                                   focal_length=focal_length)
        overflow = jnp.sum(counts > capacity).astype(jnp.int32)
        d = _tile_rays(dirs, height, width, tiles)
        target_t = _tile_rays(target.reshape(-1, 3), height, width, tiles)

        def f(s):
            colors = tile_render(masked_scene(s), idx, counts, o, d)
            return jnp.mean((colors - target_t) ** 2)

        loss, grads = jax.value_and_grad(f)(scene)
        return (loss, overflow), grads

    return vg


def _make_sharded_bucketed_step(
    optimizer, *, mesh, width, height, tiles, bucket_cfg, erf_name,
    exp_name, masked_scene, focal_length,
):
    """Mesh + bucketed scheduler: both bucket tile axes sharded over the
    mesh with the round-robin interleave (scheduler.bucketed_tile_indices),
    so every device renders a balanced mix of dense and sparse tiles at
    bucket-matched capacities — multi-chip steps no longer pay the
    single-capacity waste the scheduler removes (scheduler.py docstring).

    Tiling/bucketing runs replicated at the global level (cheap O(T²·N)
    membership + top_k); only the per-tile render — the O(count²·rays)
    part — is sharded. The reference's analog is the work-stealing pool
    over per-tile vectors (rt.cpp:64, thread-pool.h:9-35).
    """
    from sgrt_tpu.ops.pallas_chunked import tile_renderer_for
    from sgrt_tpu.ops.render import _tile_rays
    from sgrt_tpu.ops.scheduler import BucketConfig, bucketed_tile_indices
    from sgrt_tpu.ops.tiling import as_grid, gather_tiles

    n_dev = mesh.devices.size
    tx_, ty_ = as_grid(tiles)
    t2 = tx_ * ty_
    cfg = bucket_cfg
    if cfg.n_dense % n_dev or (t2 - cfg.n_dense) % n_dev:
        raise ValueError(
            f"bucket sizes ({cfg.n_dense}, {t2 - cfg.n_dense}) must divide "
            f"the mesh ({n_dev} devices); size with "
            f"probe_buckets(..., multiple_of={n_dev})")
    _check_bwd_capacity(max(cfg.cap_dense, cfg.cap_sparse), None, "pallas")
    # per-bucket routing (monolithic vs chunked) through ONE helper — a
    # fitting-scale sparse bucket must not slip back onto the monolithic
    # kernel past its ceiling
    cap_d, render_dense = tile_renderer_for(cfg.cap_dense,
                                            erf_name=erf_name,
                                            exp_name=exp_name)
    cap_s, render_sparse = tile_renderer_for(cfg.cap_sparse,
                                             erf_name=erf_name,
                                             exp_name=exp_name)
    cfg = BucketConfig(cfg.n_dense, cap_d, cap_s)

    def local_vg(scene, idx_d, cnt_d, d_d, tgt_d, idx_s, cnt_s, d_s, tgt_s, o):
        def f(s):
            ms = masked_scene(s)
            cd = render_dense(gather_tiles(ms, idx_d), o, d_d, cnt_d)
            cs = render_sparse(gather_tiles(ms, idx_s), o, d_s, cnt_s)
            # mean over this device's elements; every device holds the same
            # tile count, so pmean of the means is the global mean
            return ((jnp.sum((cd - tgt_d) ** 2) + jnp.sum((cs - tgt_s) ** 2))
                    / (cd.size + cs.size))

        return jax.value_and_grad(f)(scene)

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(),) + (P(RAYS_AXIS),) * 8 + (P(),),
        out_specs=(P(), P()),
        # pallas_call outputs carry no varying-mesh-axes metadata
        check_vma=False,
    )
    def sharded_vg(scene, *args):
        loss, grads = local_vg(scene, *args)
        return (jax.lax.pmean(loss, RAYS_AXIS),
                jax.lax.pmean(grads, RAYS_AXIS))

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state: FitState, view, o, dirs, target):
        dense_ids, idx_d, sparse_ids, idx_s, counts = bucketed_tile_indices(
            state.scene, view, tiles, cfg, focal_length=focal_length,
            interleave=n_dev)
        overflow = (jnp.sum(counts[sparse_ids] > cfg.cap_sparse)
                    + jnp.sum(counts[dense_ids] > cfg.cap_dense)
                    ).astype(jnp.int32)
        d = _tile_rays(dirs, height, width, tiles)
        target_t = _tile_rays(target.reshape(-1, 3), height, width, tiles)
        loss, grads = sharded_vg(
            state.scene, idx_d, counts[dense_ids], d[dense_ids],
            target_t[dense_ids], idx_s, counts[sparse_ids], d[sparse_ids],
            target_t[sparse_ids], o)
        scene, opt_state = _apply_updates(optimizer, grads,
                                          state.opt_state, state.scene)
        return FitState(scene, opt_state, state.step + 1), loss, overflow

    return step


def make_frame_train_step(
    optimizer: optax.GradientTransformation,
    *,
    width: int = 256,
    height: int = 256,
    tiles: int = 16,
    capacity: int = 128,
    mesh: Mesh | None = None,
    backend: str = "pallas",
    erf_name: str = "as5",
    exp_name: str = "exact",
    trainable: tuple[str, ...] = ("mu", "sigma", "magnitude", "albedo"),
    bucket_cfg=None,
    focal_length=1.0,
):
    """Tiled whole-frame train step — the north-star fwd+bwd configuration
    (BASELINE.json: teapot fwd+bwd with tile culling).

    Returns step(state, view, o, dirs, target_image) → (state, loss,
    overflow): per-frame re-tiling (non-differentiable index computation),
    gather, fused-kernel forward + custom-VJP backward, scatter-add of tile
    gradients back to the scene (the gather transpose), psum over the mesh.

    overflow (scalar int32) counts tiles whose true member count exceeded
    `capacity` this step — a nonzero value means Gaussians were dropped from
    the loss AND its gradients (the reference never truncates: per-tile
    std::vector, rt.cpp:64). Callers must check it (scripts/fit_demo.py and
    verify_tpu.py assert it is 0 every step; the CLI warns).

    With a mesh, tiles are the sharded axis (each device renders T²/D
    tiles — the multi-chip analog of the reference's thread-per-tile pool,
    rt.h:344-404); the scene is replicated and gradients are pmean'd over
    ICI (one combined ~KiB variadic all-reduce — see docs/OVERLAP.md for
    the measured compiled schedule; at this payload size overlap with the
    backward is immaterial).

    bucket_cfg (ops.scheduler.BucketConfig): dense/sparse capacity
    bucketing of tiles — big win on skewed scenes like the teapot. With a
    mesh, each bucket's tile axis is sharded round-robin over devices (the
    count-sorted interleave of scheduler.bucketed_tile_indices), so every
    device carries a balanced slice of both buckets; bucket sizes must
    divide the mesh (probe_buckets(..., multiple_of=D)).
    """
    from sgrt_tpu.ops.pallas_kernel import _block_sizes
    from sgrt_tpu.ops.render import _tile_rays, _untile_image
    from sgrt_tpu.ops.tiling import gather_tiles, tile_indices

    from sgrt_tpu.ops.tiling import as_grid

    # An adaptive bucket config that selected single-launch (n_dense == 0)
    # still carries the probed capacity; the mesh path below would
    # otherwise silently drop it and fall back to the `capacity` kwarg
    # (default 128) — honor the larger of the two.
    if (bucket_cfg is not None and backend == "pallas"
            and not bucket_cfg.n_dense and mesh is not None):
        capacity = max(capacity, bucket_cfg.cap_dense)
    _check_bwd_capacity(capacity, bucket_cfg, backend)
    if backend == "pallas":
        from sgrt_tpu.ops.pallas_chunked import tile_renderer_for

        capacity, _render = tile_renderer_for(capacity, erf_name=erf_name,
                                              exp_name=exp_name)
    else:
        _, qb = _block_sizes(capacity)
        capacity = -(-capacity // qb) * qb
    tx_, ty_ = as_grid(tiles)
    t2 = tx_ * ty_

    if mesh is None:
        frame_vg = make_frame_value_and_grad(
            width=width, height=height, tiles=tiles, capacity=capacity,
            backend=backend, erf_name=erf_name, exp_name=exp_name,
            trainable=trainable, bucket_cfg=bucket_cfg,
            focal_length=focal_length,
        )

        @functools.partial(jax.jit, donate_argnums=(0,))
        def step(state: FitState, view, o, dirs, target):
            (loss, overflow), grads = frame_vg(state.scene, view, o, dirs,
                                               target)
            scene, opt_state = _apply_updates(optimizer, grads,
                                              state.opt_state, state.scene)
            return FitState(scene, opt_state, state.step + 1), loss, overflow

        return step

    def tile_render(scene, idx, counts, o, d):
        tiled = gather_tiles(scene, idx)
        if backend == "pallas":
            return _render(tiled, o, d, counts)
        return _xla_tile_render(tiled, o, d, min(128, capacity), 16)

    def masked_scene(scene):
        fields = {
            f: (getattr(scene, f) if f in trainable
                else jax.lax.stop_gradient(getattr(scene, f)))
            for f in ("mu", "sigma", "magnitude", "albedo")
        }
        return GaussianScene(**fields)

    if bucket_cfg is not None and backend == "pallas" and bucket_cfg.n_dense:
        return _make_sharded_bucketed_step(
            optimizer, mesh=mesh, width=width, height=height, tiles=tiles,
            bucket_cfg=bucket_cfg, erf_name=erf_name, exp_name=exp_name,
            masked_scene=masked_scene, focal_length=focal_length)

    def local_vg(scene, idx, counts, o, d, target_t):
        def f(s):
            colors = tile_render(masked_scene(s), idx, counts, o, d)
            return jnp.mean((colors - target_t) ** 2)

        return jax.value_and_grad(f)(scene)

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(RAYS_AXIS), P(RAYS_AXIS), P(), P(RAYS_AXIS),
                  P(RAYS_AXIS)),
        out_specs=(P(), P()),
        # pallas_call outputs carry no varying-mesh-axes metadata
        check_vma=False,
    )
    def sharded_vg(scene, idx, counts, o, d, target_t):
        loss, grads = local_vg(scene, idx, counts, o, d, target_t)
        return (jax.lax.pmean(loss, RAYS_AXIS),
                jax.lax.pmean(grads, RAYS_AXIS))

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state: FitState, view, o, dirs, target):
        idx, counts = tile_indices(state.scene, view, tiles, capacity,
                                   focal_length=focal_length)
        overflow = jnp.sum(counts > capacity).astype(jnp.int32)
        d = _tile_rays(dirs, height, width, tiles)
        target_t = _tile_rays(target.reshape(-1, 3), height, width, tiles)
        loss, grads = sharded_vg(state.scene, idx, counts, o, d, target_t)
        scene, opt_state = _apply_updates(optimizer, grads,
                                          state.opt_state, state.scene)
        return FitState(scene, opt_state, state.step + 1), loss, overflow

    return step


def make_slab_frame_train_step(
    optimizer: optax.GradientTransformation,
    *,
    width: int = 512,
    height: int = 512,
    tiles=(64, 32),
    capacity: int = 4096,
    slab_tiles: int = 64,
    mesh: Mesh | None = None,
    erf_name: str = "as5",
    exp_name: str = "exact",
    trainable: tuple[str, ...] | None = None,
    aniso: bool = False,
    focal_length=1.0,
):
    """Host-SLABBED train step for fitting-scale dense scenes.

    A single-program step at 100k Gaussians runs ~90 s of kernel time —
    and the device runtime enforces a per-program execution budget
    (measured on the tunneled v5e: programs past ~60-90 s are killed with
    "TPU worker crashed", reproduced with a plain XLA matmul loop, so it
    is an infrastructure property, not a kernel property). This step
    splits the count-sorted tile axis into slabs of `slab_tiles` tiles and
    runs ONE bounded fwd+bwd device program per slab, accumulating
    gradients across slabs — exact, because the frame loss is a sum over
    pixels, so per-slab sum-of-squared-error gradients add. The optimizer
    applies once at the end.

    Work per slab is O(sum of count² over its tiles): tiles are processed
    in count-sorted order, so the densest slab bounds the largest program;
    size `slab_tiles` so that slab stays well under the execution budget
    (scripts/large_n.py derives it from the probed counts). Capacities
    above pallas_kernel.MAX_BWD_CAPACITY route to the chunked kernel
    exactly as make_frame_train_step.

    With a mesh, each slab's tile axis is sharded over the devices (the
    slab is a count-sorted contiguous range, so the per-device shards
    within it carry near-equal counts) and per-slab gradients psum over
    ICI; slab_tiles must divide by the mesh size.

    Returns step(state, view, o, dirs, target) → (state, loss, overflow).
    Dispatches n_slabs + 2 device programs per step with no host syncs in
    between (device execution pipelines behind the dispatch loop).
    """
    from sgrt_tpu.ops.render import _tile_rays
    from sgrt_tpu.ops.tiling import as_grid, gather_tiles, tile_indices

    _check_bwd_capacity(capacity, None, "pallas")
    if aniso:
        # anisotropic slab step: same structure, aniso gather/proxy/kernels
        from sgrt_tpu.ops.anisotropic import gather_tiles_aniso, iso_proxy
        from sgrt_tpu.ops.pallas_chunked_aniso import tile_renderer_aniso_for

        capacity, _render = tile_renderer_aniso_for(
            capacity, erf_name=erf_name, exp_name=exp_name)
        _gather = gather_tiles_aniso
        _proxy = iso_proxy
        fields = ("mu", "scale", "magnitude", "albedo")
    else:
        from sgrt_tpu.ops.pallas_chunked import tile_renderer_for

        capacity, _render = tile_renderer_for(capacity, erf_name=erf_name,
                                              exp_name=exp_name)
        _gather = gather_tiles
        _proxy = lambda s: s
        fields = ("mu", "sigma", "magnitude", "albedo")
    trainable = fields if trainable is None else trainable
    tx_, ty_ = as_grid(tiles)
    t2 = tx_ * ty_
    n_dev = 1 if mesh is None else mesh.devices.size
    if t2 % n_dev:
        raise ValueError(f"tile count {t2} not divisible by the mesh "
                         f"({n_dev} devices)")
    slab_tiles = max(n_dev, min(slab_tiles, t2))
    while t2 % slab_tiles or slab_tiles % n_dev:
        slab_tiles -= 1      # largest divisor of t2 that the mesh divides
    n_slabs = t2 // slab_tiles

    def masked_scene(scene):
        vals = {
            f: (getattr(scene, f) if f in trainable
                else jax.lax.stop_gradient(getattr(scene, f)))
            for f in fields
        }
        return type(scene)(**vals)

    @jax.jit
    def _prep(scene, view, dirs, target):
        idx, counts = tile_indices(_proxy(scene), view, tiles, capacity,
                                   focal_length=focal_length)
        order = jnp.argsort(-counts)
        d = _tile_rays(dirs, height, width, tiles)
        tgt = _tile_rays(target.reshape(-1, 3), height, width, tiles)
        overflow = jnp.sum(counts > capacity).astype(jnp.int32)
        return (idx[order], counts[order], d[order], tgt[order], overflow)

    def _local_vg(scene, idx_s, cnt_s, d_s, tgt_s, o):
        def f(s):
            tiled = _gather(masked_scene(s), idx_s)
            colors = _render(tiled, o, d_s, cnt_s)
            return jnp.sum((colors - tgt_s) ** 2)

        return jax.value_and_grad(f)(scene)

    if mesh is not None:
        @functools.partial(
            jax.shard_map,
            mesh=mesh,
            in_specs=(P(), P(RAYS_AXIS), P(RAYS_AXIS), P(RAYS_AXIS),
                      P(RAYS_AXIS), P()),
            out_specs=(P(), P()),
            check_vma=False,   # pallas outputs carry no mesh-axis metadata
        )
        def _sharded_vg(scene, idx_s, cnt_s, d_s, tgt_s, o):
            loss, grads = _local_vg(scene, idx_s, cnt_s, d_s, tgt_s, o)
            # per-slab SUMS (not means): gradient accumulation across
            # slabs stays exact under the psum
            return (jax.lax.psum(loss, RAYS_AXIS),
                    jax.lax.psum(grads, RAYS_AXIS))

        _slab_vg = jax.jit(_sharded_vg)
    else:
        _slab_vg = jax.jit(_local_vg)

    @jax.jit
    def _accum(tot, grads, l, g):
        return tot + l, jax.tree_util.tree_map(jnp.add, grads, g)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def _apply(state: FitState, grads, sq_sum):
        loss = sq_sum / (height * width * 3)
        grads = jax.tree_util.tree_map(
            lambda gr: gr / (height * width * 3), grads)
        scene, opt_state = _apply_updates(optimizer, grads,
                                          state.opt_state, state.scene)
        return FitState(scene, opt_state, state.step + 1), loss

    def step(state: FitState, view, o, dirs, target):
        idx, counts, d, tgt, overflow = _prep(state.scene, view, dirs,
                                              target)
        # seed the accumulators from slab 0's result so they carry ITS
        # sharding from the start — mixing fresh single-device zeros with
        # mesh-replicated outputs would flip shardings (and silently
        # recompile _accum) between calls 1 and 2
        tot, grads = _slab_vg(state.scene, idx[:slab_tiles],
                              counts[:slab_tiles], d[:slab_tiles],
                              tgt[:slab_tiles], o)
        for s in range(1, n_slabs):
            sl = slice(s * slab_tiles, (s + 1) * slab_tiles)
            l, g = _slab_vg(state.scene, idx[sl], counts[sl], d[sl],
                            tgt[sl], o)
            tot, grads = _accum(tot, grads, l, g)
        state, loss = _apply(state, grads, tot)
        return state, loss, overflow

    return step


def make_aniso_frame_train_step(
    optimizer: optax.GradientTransformation,
    *,
    width: int = 256,
    height: int = 256,
    tiles: int = 16,
    capacity: int = 128,
    mesh: Mesh | None = None,
    erf_name: str = "as5",
    exp_name: str = "exact",
    trainable: tuple[str, ...] = ("mu", "scale", "magnitude", "albedo"),
    bucket_cfg=None,
    focal_length=1.0,
):
    """Tiled whole-frame train step for ANISOTROPIC scenes — the
    diagonal-covariance sibling of make_frame_train_step: per-frame
    re-tiling on the conservative max-scale footprint
    (anisotropic.iso_proxy), packed 10-column gather, fused anisotropic
    kernel fwd + analytic-VJP bwd (ops.pallas_aniso — gradients include
    the per-axis scales; saved-T backward auto-selected), optimizer
    update. With a mesh, tiles are the sharded axis and gradients are
    pmean'd over ICI, exactly as the isotropic step.

    bucket_cfg (ops.scheduler.BucketConfig): dense/sparse capacity
    bucketing of tiles, exactly as the isotropic step — bucket membership
    comes from the iso_proxy counts. With a mesh, both bucket tile axes
    shard with the round-robin interleave; bucket sizes must divide the
    mesh.

    Returns step(state, view, o, dirs, target) → (state, loss, overflow);
    state is a FitState whose .scene is an anisotropic.AnisoScene.
    """
    from sgrt_tpu.ops.anisotropic import gather_tiles_aniso, iso_proxy
    from sgrt_tpu.ops.pallas_chunked import MAX_CHUNKED_CAPACITY
    from sgrt_tpu.ops.pallas_chunked_aniso import tile_renderer_aniso_for
    from sgrt_tpu.ops.render import _tile_rays
    from sgrt_tpu.ops.tiling import as_grid, tile_indices

    if bucket_cfg is not None and not bucket_cfg.n_dense:
        # adaptive probe chose single-launch: honor its capacity
        capacity = max(capacity, bucket_cfg.cap_dense)
        bucket_cfg = None

    worst = capacity if bucket_cfg is None else max(capacity,
                                                    bucket_cfg.cap_dense,
                                                    bucket_cfg.cap_sparse)
    # above the monolithic aniso ceiling (measured 6144), capacities route
    # to the CHUNKED aniso kernel — only past the chunked ceiling is the
    # grid truly too coarse
    if worst > MAX_CHUNKED_CAPACITY:
        raise ValueError(
            f"per-tile capacity {worst} exceeds even the chunked "
            f"anisotropic kernel's ceiling ({MAX_CHUNKED_CAPACITY}); use a "
            "finer tile grid so fewer Gaussians land in each tile")
    capacity, _render = tile_renderer_aniso_for(capacity, erf_name=erf_name,
                                                exp_name=exp_name)
    tx_, ty_ = as_grid(tiles)
    t2 = tx_ * ty_
    n_dev = 1 if mesh is None else mesh.devices.size
    if mesh is not None and t2 % n_dev:
        raise ValueError(f"tile count {t2} not divisible by the mesh "
                         f"({n_dev} devices)")

    def masked_scene(scene):
        fields = {
            f: (getattr(scene, f) if f in trainable
                else jax.lax.stop_gradient(getattr(scene, f)))
            for f in ("mu", "scale", "magnitude", "albedo")
        }
        return type(scene)(**fields)

    if bucket_cfg is not None:
        from sgrt_tpu.ops.scheduler import BucketConfig, bucketed_tile_indices

        cap_d, render_dense = tile_renderer_aniso_for(
            bucket_cfg.cap_dense, erf_name=erf_name, exp_name=exp_name)
        cap_s, render_sparse = tile_renderer_aniso_for(
            bucket_cfg.cap_sparse, erf_name=erf_name, exp_name=exp_name)
        cfg = BucketConfig(bucket_cfg.n_dense, cap_d, cap_s)
        if cfg.n_dense % n_dev or (t2 - cfg.n_dense) % n_dev:
            raise ValueError(
                f"bucket sizes ({cfg.n_dense}, {t2 - cfg.n_dense}) must "
                f"divide the mesh ({n_dev} devices)")

        def local_vg(scene, idx_d, cnt_d, d_d, tgt_d, idx_s, cnt_s, d_s,
                     tgt_s, o):
            def f(s):
                ms = masked_scene(s)
                cd = render_dense(gather_tiles_aniso(ms, idx_d), o, d_d,
                                  cnt_d)
                cs = render_sparse(gather_tiles_aniso(ms, idx_s), o, d_s,
                                   cnt_s)
                return ((jnp.sum((cd - tgt_d) ** 2)
                         + jnp.sum((cs - tgt_s) ** 2))
                        / (cd.size + cs.size))

            return jax.value_and_grad(f)(scene)

        if mesh is not None:
            @functools.partial(
                jax.shard_map, mesh=mesh,
                in_specs=(P(),) + (P(RAYS_AXIS),) * 8 + (P(),),
                out_specs=(P(), P()), check_vma=False,
            )
            def vg(scene, *args):
                loss, grads = local_vg(scene, *args)
                return (jax.lax.pmean(loss, RAYS_AXIS),
                        jax.lax.pmean(grads, RAYS_AXIS))
        else:
            vg = local_vg

        @functools.partial(jax.jit, donate_argnums=(0,))
        def step(state: FitState, view, o, dirs, target):
            dense_ids, idx_d, sparse_ids, idx_s, counts = \
                bucketed_tile_indices(iso_proxy(state.scene), view, tiles,
                                      cfg, focal_length=focal_length,
                                      interleave=n_dev)
            overflow = (jnp.sum(counts[sparse_ids] > cfg.cap_sparse)
                        + jnp.sum(counts[dense_ids] > cfg.cap_dense)
                        ).astype(jnp.int32)
            d = _tile_rays(dirs, height, width, tiles)
            tgt = _tile_rays(target.reshape(-1, 3), height, width, tiles)
            loss, grads = vg(state.scene, idx_d, counts[dense_ids],
                             d[dense_ids], tgt[dense_ids], idx_s,
                             counts[sparse_ids], d[sparse_ids],
                             tgt[sparse_ids], o)
            scene, opt_state = _apply_updates(optimizer, grads,
                                              state.opt_state, state.scene)
            return FitState(scene, opt_state, state.step + 1), loss, overflow

        return step

    def local_vg(scene, idx, counts, o, d, target_t):
        def f(s):
            colors = _render(gather_tiles_aniso(masked_scene(s), idx), o, d,
                             counts)
            return jnp.mean((colors - target_t) ** 2)

        return jax.value_and_grad(f)(scene)

    if mesh is not None:
        @functools.partial(
            jax.shard_map,
            mesh=mesh,
            in_specs=(P(), P(RAYS_AXIS), P(RAYS_AXIS), P(), P(RAYS_AXIS),
                      P(RAYS_AXIS)),
            out_specs=(P(), P()),
            check_vma=False,
        )
        def sharded_vg(scene, idx, counts, o, d, target_t):
            loss, grads = local_vg(scene, idx, counts, o, d, target_t)
            return (jax.lax.pmean(loss, RAYS_AXIS),
                    jax.lax.pmean(grads, RAYS_AXIS))

        vg = sharded_vg
    else:
        vg = local_vg

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state: FitState, view, o, dirs, target):
        idx, counts = tile_indices(iso_proxy(state.scene), view, tiles,
                                   capacity, focal_length=focal_length)
        overflow = jnp.sum(counts > capacity).astype(jnp.int32)
        d = _tile_rays(dirs, height, width, tiles)
        target_t = _tile_rays(target.reshape(-1, 3), height, width, tiles)
        loss, grads = vg(state.scene, idx, counts, o, d, target_t)
        scene, opt_state = _apply_updates(optimizer, grads,
                                          state.opt_state, state.scene)
        return FitState(scene, opt_state, state.step + 1), loss, overflow

    return step


def fit(
    scene: GaussianScene,
    o,
    dirs,
    target,
    steps: int = 200,
    learning_rate: float = 1e-2,
    mesh: Mesh | None = None,
    optimizer: optax.GradientTransformation | None = None,
    callback: Callable[[int, float], None] | None = None,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 100,
    **step_kwargs,
) -> tuple[GaussianScene, list]:
    """Fit a scene to target ray colors. Returns (fitted scene, loss history).

    checkpoint_dir enables orbax checkpointing every `checkpoint_every` steps
    (resumable via sgrt_tpu.utils.checkpoint.restore_fit).
    """
    optimizer = optimizer or optax.adam(learning_rate)
    step_fn = make_train_step(optimizer, mesh=mesh, **step_kwargs)
    state = init_state(scene, optimizer, mesh)

    mgr = None
    if checkpoint_dir is not None:
        from sgrt_tpu.utils.checkpoint import make_manager, save_fit

        mgr = make_manager(checkpoint_dir)

    losses = []
    for i in range(steps):
        state, loss = step_fn(state, o, dirs, target)
        # Keep the device array: appending doesn't force a host sync, so
        # dispatch still pipelines; the dense history is realized once at
        # the end.
        losses.append(loss)
        if callback is not None:
            callback(i, float(loss))
        if mgr is not None and (i + 1) % checkpoint_every == 0:
            save_fit(mgr, int(state.step), state)
    if mgr is not None:
        save_fit(mgr, int(state.step), state)
        mgr.wait_until_finished()
    return state.scene, [float(l) for l in losses]
