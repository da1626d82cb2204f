"""Anisotropic (diagonal-covariance) Gaussians — EXCEEDS the reference.

The reference renderer is strictly isotropic (scalar sigma,
src/vrt/types.h:195-229); its only anisotropy artifact is a Julia
projection prototype (julia/tiling_projection.jl:10-33) that never reaches
the renderer. This module generalizes the full differentiable pipeline to
per-axis scales, reusing the closed-form erf transmittance:

Math. For a diagonal covariance D = diag(s1^2, s2^2, s3^2) the density is
pdf(x) = c * exp(-1/2 (x-mu)^T D^-1 (x-mu)). Along the ray x = o + t*n
(|n| = 1) the exponent is quadratic in t, so the Gaussian restricted to
any ray is STILL a 1-D Gaussian — with direction-dependent parameters:

    A = sum_i n_i^2 / d_i          (d_i = s_i^2)
    B = sum_i (o-mu)_i n_i / d_i
    C = sum_i (o-mu)_i^2 / d_i
    sigma_bar = 1/sqrt(A),  mu_bar = -B/A,
    cbar      = c * exp(-1/2 (C - B^2/A))

With (mu_bar, sigma_bar, cbar) per (ray, Gaussian), the reference's entire
closed-form machinery carries over verbatim (isotropic d_i = sigma^2
recovers mu_bar = (mu-o).n, sigma_bar = sigma, cbar = the rt.h:32-54
coefficient — asserted by tests/test_aniso.py):

    T(t) = exp( sum_q sigma_bar_q cbar_q sqrt(pi/2)
                * (erf(-mu_bar_q/(sqrt2 sigma_bar_q))
                   - erf((t - mu_bar_q)/(sqrt2 sigma_bar_q))) )
    L    = sum_q a_q sum_k sigma_bar_q * cbar_q e^{-k^2/2} * T(t_qk),
           t_qk = mu_bar_q + k sigma_bar_q

Everything here is plain differentiable jnp (XLA-compiled on TPU), so
gradients w.r.t. mu, PER-AXIS scales, magnitude and albedo come from
autodiff; fitting anisotropic scenes works through the same optax loops.
The hand-fused Pallas kernel remains isotropic (its sigma/inv are per-
Gaussian columns; the anisotropic generalization makes them per-(Gaussian,
ray) planes — a planned kernel variant, documented in docs/PARITY.md).
"""

from __future__ import annotations

import functools

import flax.struct
import jax
import jax.numpy as jnp
from jax.scipy.special import erf

from sgrt_tpu.models.camera import Camera
from sgrt_tpu.models.gaussians import GaussianScene
from sgrt_tpu.ops.reference import INV_SQRT_2_PI, K_TAPS, SQRT_2
from sgrt_tpu.ops.render import K_WEIGHTS


@flax.struct.dataclass
class AnisoScene:
    """Pytree of N diagonal-covariance 3D Gaussians.

    pdf_q(x) = magnitude_q * exp(-1/2 sum_i (x - mu_q)_i^2 / scale_q,i^2)
    """

    mu: jnp.ndarray         # (N, 3)
    scale: jnp.ndarray      # (N, 3) per-axis stddevs
    magnitude: jnp.ndarray  # (N,)
    albedo: jnp.ndarray     # (N, 3)

    @property
    def n(self) -> int:
        return self.mu.shape[0]

    def pdf(self, x: jnp.ndarray) -> jnp.ndarray:
        d2 = jnp.sum(((x[None, :] - self.mu) / self.scale) ** 2, axis=-1)
        return self.magnitude * jnp.exp(-0.5 * d2)


def from_isotropic(scene: GaussianScene) -> AnisoScene:
    """Embed an isotropic scene (scale = (sigma, sigma, sigma))."""
    return AnisoScene(
        mu=scene.mu,
        scale=jnp.repeat(scene.sigma[:, None], 3, axis=1),
        magnitude=scene.magnitude,
        albedo=scene.albedo,
    )


def iso_proxy(scene: AnisoScene) -> GaussianScene:
    """Conservative isotropic stand-in (sigma = max per-axis scale) for the
    projected-footprint tile culling: the true anisotropic projected
    footprint is contained in the max-scale disc, so the 3.3-sigma
    membership test (ops.tiling) stays a superset — never culls a
    contributing Gaussian, only admits extra ones."""
    return GaussianScene(
        mu=scene.mu,
        sigma=jnp.max(scene.scale, axis=-1),
        magnitude=scene.magnitude,
        albedo=scene.albedo,
    )


def pad_scene_aniso(scene: AnisoScene, multiple: int = 128) -> AnisoScene:
    """Inert padding (scale=1, magnitude=0), as models.gaussians.pad_scene."""
    n_pad = (-scene.n) % multiple
    if n_pad == 0:
        return scene
    return AnisoScene(
        mu=jnp.concatenate([scene.mu, jnp.zeros((n_pad, 3), jnp.float32)]),
        scale=jnp.concatenate([scene.scale, jnp.ones((n_pad, 3), jnp.float32)]),
        magnitude=jnp.concatenate(
            [scene.magnitude, jnp.zeros((n_pad,), jnp.float32)]),
        albedo=jnp.concatenate([scene.albedo, jnp.zeros((n_pad, 3), jnp.float32)]),
    )


def _aniso_ray_terms(o, dirs, scene: AnisoScene, exp_fn=jnp.exp):
    """Per-(ray, Gaussian) 1-D restriction parameters.

    dirs (R,3) unit rays → mu_bar, sigma_bar, cbar, each (R, N).
    """
    inv_d = 1.0 / (scene.scale * scene.scale)       # (N,3) = 1/d_i
    v = o[None, :] - scene.mu                       # (N,3) = o - mu
    # A (R,N) = n^2 . (1/d);  B (R,N) = sum_i v_i n_i / d_i;  C (N,)
    A = jnp.matmul(dirs * dirs, inv_d.T, precision=jax.lax.Precision.HIGHEST)
    B = jnp.matmul(dirs, (v * inv_d).T, precision=jax.lax.Precision.HIGHEST)
    C = jnp.sum(v * v * inv_d, axis=-1)             # (N,)
    sigma_bar = 1.0 / jnp.sqrt(A)
    mu_bar = -B / A
    cbar = scene.magnitude[None, :] * exp_fn(-0.5 * (C[None, :] - B * B / A))
    return mu_bar, sigma_bar, cbar


def transmittance_aniso(o, n, s, scene: AnisoScene) -> jnp.ndarray:
    """Closed-form anisotropic transmittance at o + s*n (one ray)."""
    mu_bar, sigma_bar, cbar = _aniso_ray_terms(o, n[None, :], scene)
    mu_bar, sigma_bar, cbar = mu_bar[0], sigma_bar[0], cbar[0]   # (N,)
    inv = 1.0 / (SQRT_2 * sigma_bar)
    t = jnp.sum(sigma_bar * cbar * INV_SQRT_2_PI
                * (erf(-mu_bar * inv) - erf((s - mu_bar) * inv)))
    return jnp.exp(t)


def transmittance_step_aniso(o, n, s, delta, scene: AnisoScene) -> jnp.ndarray:
    """Riemann-sum numerical transmittance — the anisotropic oracle's
    oracle (the analog of rt.cpp:8-17). s, delta: Python floats."""
    ts = jnp.arange(0.0, float(s) + 1e-9, float(delta))
    pts = o[None, :] + ts[:, None] * n[None, :]       # (S,3)
    z = (pts[:, None, :] - scene.mu[None, :, :]) / scene.scale[None, :, :]
    dens = scene.magnitude[None, :] * jnp.exp(-0.5 * jnp.sum(z * z, axis=-1))
    return jnp.exp(-delta * jnp.sum(dens))


def radiance_aniso(o, n, scene: AnisoScene) -> jnp.ndarray:
    """Oracle radiance along one ray: literal 5-tap quadrature with the
    EXPLICIT matrix-form pdf at each sample point (no algebraic collapse),
    so the fused path below is tested against independent math."""
    mu_bar, sigma_bar, _ = _aniso_ray_terms(o, n[None, :], scene)
    mu_bar, sigma_bar = mu_bar[0], sigma_bar[0]       # (N,)
    s_pk = mu_bar[:, None] + K_TAPS[None, :] * sigma_bar[:, None]   # (N,5)

    t_fn = jax.vmap(jax.vmap(lambda s: transmittance_aniso(o, n, s, scene)))
    T = t_fn(s_pk)                                    # (N,5)

    pts = o[None, None, :] + s_pk[..., None] * n[None, None, :]     # (N,5,3)
    z = (pts - scene.mu[:, None, :]) / scene.scale[:, None, :]
    pdf = scene.magnitude[:, None] * jnp.exp(-0.5 * jnp.sum(z * z, axis=-1))

    inner = jnp.sum(pdf * T * sigma_bar[:, None], axis=-1)          # (N,)
    return jnp.matmul(inner, scene.albedo, precision=jax.lax.Precision.HIGHEST)


def _radiance_block_aniso(o, dirs, scene: AnisoScene, q_block: int,
                          erf_name: str = "exact",
                          exp_name: str = "exact"):
    """Fused radiance for a block of rays (R,3) → (R,3) — the anisotropic
    twin of ops.render._radiance_block: same pdf collapse
    (pdf at t_pk = cbar * e^{-k^2/2}), same hoisted-erf1 base, same
    q-blocked lax.scan bounding the (R, Qb, 5N) pairwise intermediate;
    sigma_bar/inv ride along as (Qb, R) planes instead of (Qb,) columns.
    erf_name/exp_name select the approximation (ops.approx registries) —
    the same hooks as the isotropic XLA backend (ops.render:45-52)."""
    from sgrt_tpu.ops.render import _resolve_approx

    erf_fn, exp_fn = _resolve_approx(erf_name, exp_name)
    n = scene.n
    mu_bar, sigma_bar, cbar = _aniso_ray_terms(o, dirs, scene, exp_fn)
    coeff = sigma_bar * INV_SQRT_2_PI * cbar
    inv = 1.0 / (SQRT_2 * sigma_bar)
    base = jnp.sum(coeff * erf_fn(-mu_bar * inv), axis=-1)       # (R,)

    s = mu_bar[:, :, None] + K_TAPS[None, None, :] * sigma_bar[:, :, None]
    s = s.reshape(dirs.shape[0], n * 5)                          # (R, 5N)

    nq = n // q_block
    mu_bar_b = mu_bar.T.reshape(nq, q_block, -1)                 # (nq, Qb, R)
    coeff_b = coeff.T.reshape(nq, q_block, -1)
    inv_b = inv.T.reshape(nq, q_block, -1)

    @jax.checkpoint
    def body(acc, blk):
        mu_q, co_q, inv_q = blk                    # (Qb,R) x3
        args = (s[:, None, :] - mu_q.T[:, :, None]) * inv_q.T[:, :, None]
        acc = acc + jnp.sum(co_q.T[:, :, None] * erf_fn(args), axis=1)
        return acc, None

    acc0 = jnp.zeros_like(s)
    acc, _ = jax.lax.scan(body, acc0, (mu_bar_b, coeff_b, inv_b))

    T = exp_fn(base[:, None] - acc).reshape(-1, n, 5)            # (R,N,5)
    tw = jnp.matmul(T, K_WEIGHTS, precision=jax.lax.Precision.HIGHEST)
    weights = sigma_bar * cbar * tw                              # (R,N)
    return jnp.matmul(weights, scene.albedo,
                      precision=jax.lax.Precision.HIGHEST)


def render_rays_aniso_impl(o, dirs, scene: AnisoScene, q_block: int = 128,
                           ray_block: int = 2048, erf_name: str = "exact",
                           exp_name: str = "exact"):
    """Unjitted anisotropic render of a ray batch → colors (R,3).
    Differentiable w.r.t. every scene field including the per-axis scales."""
    scene = pad_scene_aniso(scene, q_block)
    r = dirs.shape[0]
    pad = (-r) % ray_block
    if pad:
        # unit pad rays: |d| <= 1 keeps B^2/A <= C (Cauchy-Schwarz in the
        # D^-1/2 metric) so dead rays cannot overflow cbar — the same NaN
        # guard as the isotropic paths (ops.render.render_rays_impl).
        unit = jnp.zeros((pad, 3), dirs.dtype).at[:, 2].set(1.0)
        dirs_p = jnp.concatenate([dirs, unit])
    else:
        dirs_p = dirs
    batches = dirs_p.reshape(-1, ray_block, 3)
    f = lambda d: _radiance_block_aniso(o, d, scene, q_block, erf_name,
                                        exp_name)
    colors = jax.lax.map(f, batches).reshape(-1, 3)
    return colors[:r]


render_rays_aniso = jax.jit(render_rays_aniso_impl,
                            static_argnames=("q_block", "ray_block",
                                             "erf_name", "exp_name"))


def render_aniso(scene: AnisoScene, camera: Camera, origin=None,
                 q_block: int = 128, ray_block: int = 2048,
                 erf_name: str = "exact",
                 exp_name: str = "exact") -> jnp.ndarray:
    """Full-frame anisotropic render → float32 (H, W, 3), unclamped."""
    o, dirs = camera.rays(origin)
    colors = render_rays_aniso(o, dirs, scene, q_block=q_block,
                               ray_block=ray_block, erf_name=erf_name,
                               exp_name=exp_name)
    return colors.reshape(camera.height, camera.width, 3)


@functools.partial(jax.jit, static_argnames=("h", "w", "tiles", "capacity",
                                             "q_block", "tile_batch",
                                             "backend", "erf_name",
                                             "exp_name", "bucket_cfg"))
def _render_tiled_aniso_jit(scene, view, o, dirs, h, w, tiles, capacity,
                            q_block, tile_batch, backend,
                            erf_name="exact", exp_name="exact",
                            bucket_cfg=None, focal_length=1.0):
    from sgrt_tpu.ops.render import _tile_rays, _untile_image
    from sgrt_tpu.ops.tiling import as_grid, tile_indices

    if backend == "pallas" and bucket_cfg is not None and bucket_cfg.n_dense:
        # bucketed aniso forward: dense/sparse capacities from the
        # iso_proxy counts, two fused-aniso launches, scatter reassembly —
        # the aniso twin of scheduler.render_tiles_bucketed; per-bucket
        # routing (monolithic vs chunked) through tile_renderer_aniso_for
        from sgrt_tpu.ops.pallas_chunked_aniso import tile_renderer_aniso_for
        from sgrt_tpu.ops.scheduler import (BucketConfig,
                                            bucketed_tile_indices)

        cap_d, render_dense = tile_renderer_aniso_for(
            bucket_cfg.cap_dense, erf_name=erf_name, exp_name=exp_name)
        cap_s, render_sparse = tile_renderer_aniso_for(
            bucket_cfg.cap_sparse, erf_name=erf_name, exp_name=exp_name)
        cfg = BucketConfig(bucket_cfg.n_dense, cap_d, cap_s)
        dense_ids, idx_d, sparse_ids, idx_s, counts = bucketed_tile_indices(
            iso_proxy(scene), view, tiles, cfg, focal_length=focal_length)
        overflow = (jnp.sum(counts[sparse_ids] > cfg.cap_sparse)
                    + jnp.sum(counts[dense_ids] > cfg.cap_dense)
                    ).astype(jnp.int32)
        d = _tile_rays(dirs, h, w, tiles)
        cd = render_dense(gather_tiles_aniso(scene, idx_d), o, d[dense_ids],
                          counts[dense_ids])
        cs = render_sparse(gather_tiles_aniso(scene, idx_s), o,
                           d[sparse_ids], counts[sparse_ids])
        t2 = d.shape[0]
        colors = jnp.zeros((t2,) + cs.shape[1:], cs.dtype)
        colors = colors.at[sparse_ids].set(cs).at[dense_ids].set(cd)
        return _untile_image(colors, h, w, tiles), overflow

    if backend == "pallas":
        from sgrt_tpu.ops.pallas_chunked_aniso import tile_renderer_aniso_for

        capacity, render_tiles = tile_renderer_aniso_for(
            capacity, erf_name=erf_name, exp_name=exp_name)
        idx, counts = tile_indices(iso_proxy(scene), view, tiles, capacity,
                                   focal_length=focal_length)
        d = _tile_rays(dirs, h, w, tiles)
        overflow = jnp.sum(counts > capacity).astype(jnp.int32)
        colors = render_tiles(gather_tiles_aniso(scene, idx), o, d, counts)
        return _untile_image(colors, h, w, tiles), overflow

    idx, counts = tile_indices(iso_proxy(scene), view, tiles, capacity,
                               focal_length=focal_length)
    tiled = gather_tiles_aniso(scene, idx)
    d = _tile_rays(dirs, h, w, tiles)
    overflow = jnp.sum(counts > capacity).astype(jnp.int32)

    qb = min(q_block, capacity)

    def one_tile(args):
        tile_scene, tile_dirs = args
        return _radiance_block_aniso(o, tile_dirs, tile_scene, qb,
                                     erf_name, exp_name)

    tx, ty = as_grid(tiles)
    t2 = tx * ty
    tb = min(tile_batch, t2)
    while t2 % tb:  # largest divisor of the tile count <= tile_batch
        tb -= 1
    chunked = jax.tree_util.tree_map(
        lambda a: a.reshape(t2 // tb, tb, *a.shape[1:]), (tiled, d))
    colors = jax.lax.map(jax.vmap(one_tile), chunked).reshape(t2, -1, 3)
    return _untile_image(colors, h, w, tiles), overflow


def render_tiled_aniso(scene: AnisoScene, camera: Camera, origin=None,
                       tiles=16, capacity: int = 128, q_block: int = 128,
                       tile_batch: int = 16, backend: str = "xla",
                       erf_name: str = "exact", exp_name: str = "exact",
                       bucket_cfg=None):
    """Tiled + culled anisotropic frame → ((H, W, 3), overflow). Culling
    uses the conservative max-scale footprint (iso_proxy);
    backend="pallas" routes through the fused anisotropic kernel
    (ops.pallas_aniso). erf_name/exp_name select the approximation on
    either backend (ops.approx registries). bucket_cfg
    (ops.scheduler.BucketConfig, pallas only): dense/sparse capacity
    bucketing exactly as the isotropic frame path."""
    from sgrt_tpu.ops.pallas_kernel import _block_sizes
    from sgrt_tpu.ops.tiling import as_grid

    h, w = camera.height, camera.width
    tx, ty = as_grid(tiles)
    if h % ty or w % tx:
        raise ValueError(f"image {w}x{h} not divisible into {tx}x{ty} tiles")
    o, dirs = camera.rays(origin)
    if backend == "pallas":
        import math

        pb, qb_k = _block_sizes(capacity)
        align = math.lcm(pb, qb_k)
        capacity = max(align, -(-capacity // align) * align)
        qb = min(q_block, capacity)
    else:
        qb = min(q_block, max(capacity, 1))
        capacity = max(qb, -(-capacity // qb) * qb)
    return _render_tiled_aniso_jit(scene, camera.view_matrix, o, dirs,
                                   h=h, w=w, tiles=tiles, capacity=capacity,
                                   q_block=qb, tile_batch=tile_batch,
                                   backend=backend, erf_name=erf_name,
                                   exp_name=exp_name, bucket_cfg=bucket_cfg,
                                   # the culling projection must match the
                                   # camera's actual rays (round-5 review:
                                   # a non-default focal length otherwise
                                   # gathers the wrong tile sets)
                                   focal_length=camera.focal_length)


def gather_tiles_aniso(scene: AnisoScene, idx: jnp.ndarray) -> AnisoScene:
    """Per-tile gather for anisotropic scenes: pack mu+scale+magnitude+
    albedo into one (N+1, 10) matrix and reuse the one-hot-MXU / DMA
    gather machinery (ops.tiling); index N selects the inert dummy."""
    from sgrt_tpu.ops.tiling import ONEHOT_MAX_SCENE_ROWS, _onehot_gather

    n = scene.n
    packed = jnp.concatenate(
        [scene.mu, scene.scale, scene.magnitude[:, None], scene.albedo],
        axis=1)                                              # (N, 10)
    dummy = jnp.zeros((1, 10), packed.dtype).at[0, 3:6].set(1.0)
    packed = jnp.concatenate([packed, dummy], axis=0)        # (N+1, 10)
    t2, k = idx.shape
    if n + 1 > ONEHOT_MAX_SCENE_ROWS:
        out = packed[idx.reshape(-1)].reshape(t2, k, 10)
    else:
        out = _onehot_gather(packed, idx.reshape(-1)).reshape(t2, k, 10)
    return AnisoScene(
        mu=out[..., 0:3],
        scale=out[..., 3:6],
        magnitude=out[..., 6],
        albedo=out[..., 7:10],
    )
