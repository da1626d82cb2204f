"""Fused, blocked forward renderer (pure jnp, XLA-compiled).

TPU-first reformulation of the reference's hot loop (broadcast_radiance +
broadcast_transmittance, src/vrt/rt.h:102-127, 205-223). Instead of the
reference's 3x3 matrix of scalar/SIMD variants, there is ONE vectorized
formulation; rays are the parallel (lane) axis and Gaussians are a blocked
reduction axis.

Two algebraic improvements over a literal translation:

1. The constant part of the transmittance exponent is hoisted:
       G(r,s) = B(r) - sum_q coeff(r,q) * erf((s - mu_bar(r,q)) * inv_q),
       B(r)   = sum_q coeff(r,q) * erf1(r,q)
   so the per-sample inner loop evaluates ONE erf per (ray, sample, q).

2. The radiance pdf at sample s_pk = mu_bar_p + k*sigma_p collapses:
       ||o + s n - mu_p||^2 = ||mu_p - o||^2 - mu_bar_p^2 + (k sigma_p)^2
       => pdf_p(o + s_pk n) = cbar(r,p) * exp(-k^2/2)
   eliminating all pdf exp evaluations (exp(-k^2/2) is a 5-entry constant),
   and turning the final color into an MXU matmul:
       L(r) = sum_p [sigma_p * cbar(r,p) * sum_k w_k T(r,p,k)] * albedo_p.

Verified against sgrt_tpu.ops.reference (the un-simplified oracle) in
tests/test_render.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.scipy.special import erf

from sgrt_tpu.models.camera import Camera
from sgrt_tpu.models.gaussians import GaussianScene, pad_scene
from sgrt_tpu.ops.reference import INV_SQRT_2_PI, K_TAPS, SQRT_2

# w_k = exp(-k^2/2) for k in {-4..0} — the collapsed pdf factors
# (numpy at import: no backend init before jax.distributed.initialize).
K_WEIGHTS = np.exp(-(K_TAPS**2) / 2.0).astype(np.float32)


def _resolve_approx(erf_name: str, exp_name: str):
    """Resolve approximation names → (erf_fn, exp_fn). The XLA analog of the
    reference templating every render path over Exp/Erf (rt.h:22-23,
    defaults approx.h:110-127) — the same registry the Pallas kernels use,
    so `--erf/--exp` act identically on both backends."""
    from sgrt_tpu.ops.approx import ERF_IMPLS, EXP_IMPLS

    return ERF_IMPLS[erf_name], EXP_IMPLS[exp_name]


def _ray_gaussian_terms(o, dirs, scene: GaussianScene, erf_fn=erf,
                        exp_fn=jnp.exp):
    """Shared per-(ray, Gaussian) precomputation.

    dirs: (R,3). Returns mu_bar (R,N), cbar (R,N), coeff (R,N), inv (N,),
    base (R,) where base = sum_q coeff*erf1.
    """
    oc = scene.mu - o[None, :]                     # (N,3)
    oc_sq = jnp.sum(oc * oc, axis=-1)              # (N,)
    # mu_bar feeds erf arguments — needs full f32, not TPU's default bf16 matmul.
    mu_bar = jnp.matmul(dirs, oc.T, precision=jax.lax.Precision.HIGHEST)  # (R,N)
    inv_2s2 = 1.0 / (2.0 * scene.sigma**2)         # (N,)
    cbar = scene.magnitude[None, :] * exp_fn(
        -(oc_sq[None, :] - mu_bar**2) * inv_2s2[None, :]
    )
    coeff = (scene.sigma * INV_SQRT_2_PI)[None, :] * cbar
    inv = 1.0 / (SQRT_2 * scene.sigma)             # (N,)
    base = jnp.sum(coeff * erf_fn(-mu_bar * inv[None, :]), axis=-1)  # (R,)
    return mu_bar, cbar, coeff, inv, base


def _radiance_block(o, dirs, scene: GaussianScene, q_block: int,
                    erf_name: str = "exact",
                    exp_name: str = "exact") -> jnp.ndarray:
    """Radiance for one block of rays: dirs (R,3) → (R,3).

    The O(R * 5N * N) erf reduction runs as a lax.scan over q-blocks so the
    pairwise intermediate stays (R, q_block, 5N).
    """
    erf_fn, exp_fn = _resolve_approx(erf_name, exp_name)
    n = scene.n
    mu_bar, cbar, coeff, inv, base = _ray_gaussian_terms(o, dirs, scene,
                                                         erf_fn, exp_fn)

    # Sample points s(r, p, k) = mu_bar(r,p) + k*sigma_p, flattened to (R, 5N).
    s = (mu_bar[:, :, None] + K_TAPS[None, None, :] * scene.sigma[None, :, None])
    s = s.reshape(dirs.shape[0], n * 5)

    nq = n // q_block
    mu_bar_b = mu_bar.T.reshape(nq, q_block, -1)    # (nq, Qb, R)
    coeff_b = coeff.T.reshape(nq, q_block, -1)
    inv_b = inv.reshape(nq, q_block)

    # checkpoint: without it, autodiff of the scan saves the (R, Qb, 5N)
    # pairwise intermediate for every step (tens of GB at frame sizes);
    # rematerializing it in the backward keeps residuals at (R, 5N).
    @jax.checkpoint
    def body(acc, blk):
        mu_q, co_q, inv_q = blk                     # (Qb,R), (Qb,R), (Qb,)
        # (R, Qb, 5N): the only pairwise intermediate.
        args = (s[:, None, :] - mu_q.T[:, :, None]) * inv_q[None, :, None]
        acc = acc + jnp.sum(co_q.T[:, :, None] * erf_fn(args), axis=1)
        return acc, None

    acc0 = jnp.zeros_like(s)
    acc, _ = jax.lax.scan(body, acc0, (mu_bar_b, coeff_b, inv_b))

    T = exp_fn(base[:, None] - acc).reshape(-1, n, 5)        # (R,N,5)
    tw = jnp.matmul(T, K_WEIGHTS, precision=jax.lax.Precision.HIGHEST)  # (R,N)
    weights = scene.sigma[None, :] * cbar * tw                # (R,N)
    return jnp.matmul(weights, scene.albedo, precision=jax.lax.Precision.HIGHEST)


def render_rays_impl(o, dirs, scene: GaussianScene, q_block: int = 128,
                     ray_block: int = 2048, erf_name: str = "exact",
                     exp_name: str = "exact"):
    """Unjitted render of a batch of rays → colors (R,3). Differentiable;
    compose with jit/shard_map/grad as needed. erf_name/exp_name select the
    approximation (ops.approx registries), as the reference's templated
    renderers do (rt.h:22-23)."""
    scene = pad_scene(scene, q_block)
    r = dirs.shape[0]
    pad = (-r) % ray_block
    # Pad rays with a UNIT direction (same fix as render_rays_pallas_impl):
    # |d| <= 1 keeps mu_bar^2 <= oc_sq (Cauchy-Schwarz) so dead rays can't
    # overflow cbar's exp to inf — 0*inf = NaN would poison the gradient of
    # the shared origin even though their colors are sliced away.
    if pad:
        unit = jnp.zeros((pad, 3), dirs.dtype).at[:, 2].set(1.0)
        dirs_p = jnp.concatenate([dirs, unit])
    else:
        dirs_p = dirs
    batches = dirs_p.reshape(-1, ray_block, 3)
    f = lambda d: _radiance_block(o, d, scene, q_block, erf_name, exp_name)
    colors = jax.lax.map(f, batches).reshape(-1, 3)
    return colors[:r]


render_rays = jax.jit(render_rays_impl,
                      static_argnames=("q_block", "ray_block", "erf_name",
                                       "exp_name"))


def render(scene: GaussianScene, camera: Camera, origin=None,
           q_block: int = 128, ray_block: int = 2048,
           erf_name: str = "exact", exp_name: str = "exact") -> jnp.ndarray:
    """Full-frame fused render → float32 (H, W, 3), unclamped."""
    o, dirs = camera.rays(origin)
    colors = render_rays(o, dirs, scene, q_block=q_block, ray_block=ray_block,
                         erf_name=erf_name, exp_name=exp_name)
    return colors.reshape(camera.height, camera.width, 3)


def _tile_rays(dirs: jnp.ndarray, h: int, w: int, tiles) -> jnp.ndarray:
    """(H*W, 3) row-major rays → (tx*ty, P, 3) grouped by image tile, tile
    order row-major (ty, tx) to match ops.tiling. `tiles`: int or (tx, ty)."""
    from sgrt_tpu.ops.tiling import as_grid

    tx, ty = as_grid(tiles)
    th, tw = h // ty, w // tx
    d = dirs.reshape(ty, th, tx, tw, 3)
    return d.transpose(0, 2, 1, 3, 4).reshape(tx * ty, th * tw, 3)


def _untile_image(colors: jnp.ndarray, h: int, w: int, tiles) -> jnp.ndarray:
    """(tx*ty, P, 3) per-tile colors → (H, W, 3). Analog of the reference's
    tile-buffer scatter-back (rt.h:388-399)."""
    from sgrt_tpu.ops.tiling import as_grid

    tx, ty = as_grid(tiles)
    th, tw = h // ty, w // tx
    c = colors.reshape(ty, tx, th, tw, 3)
    return c.transpose(0, 2, 1, 3, 4).reshape(h, w, 3)


@functools.partial(
    jax.jit, static_argnames=("h", "w", "tiles", "capacity", "q_block",
                              "tile_batch", "erf_name", "exp_name")
)
def _render_tiled_jit(scene, view, o, dirs, h, w, tiles, capacity, q_block,
                      tile_batch, erf_name="exact", exp_name="exact"):
    from sgrt_tpu.ops.tiling import gather_tiles, tile_indices

    idx, counts = tile_indices(scene, view, tiles, capacity)
    tiled = gather_tiles(scene, idx)                       # (T2, K, ...)
    d = _tile_rays(dirs, h, w, tiles)                      # (T2, P, 3)

    qb = min(q_block, capacity)

    def one_tile(args):
        tile_scene, tile_dirs = args
        return _radiance_block(o, tile_dirs, tile_scene, qb, erf_name,
                               exp_name)

    # Chunked map over tiles: vmap within a chunk (parallel lanes), lax.map
    # across chunks (bounds the pairwise intermediate).
    from sgrt_tpu.ops.tiling import as_grid

    tx, ty = as_grid(tiles)
    t2 = tx * ty
    tb = min(tile_batch, t2)
    chunked = jax.tree_util.tree_map(lambda a: a.reshape(t2 // tb, tb, *a.shape[1:]), (tiled, d))
    colors = jax.lax.map(jax.vmap(one_tile), chunked)
    colors = colors.reshape(t2, -1, 3)
    return _untile_image(colors, h, w, tiles), counts


def render_tiled(scene: GaussianScene, camera: Camera, origin=None, tiles: int = 16,
                 capacity: int | None = None, q_block: int = 128, tile_batch: int = 16,
                 check_overflow: bool = True, erf_name: str = "exact",
                 exp_name: str = "exact") -> jnp.ndarray:
    """Tiled + culled full-frame render (modes 5-8 analog) → (H, W, 3).

    Per-frame tile assignment runs on-device (the reference re-tiles on host
    every frame, main.cpp:263). `capacity` is the static per-tile Gaussian
    budget; None picks it from this frame's true max count (host sync).
    """
    from sgrt_tpu.ops.tiling import as_grid

    h, w = camera.height, camera.width
    tx, ty = as_grid(tiles)
    if h % ty or w % tx:
        raise ValueError(f"image {w}x{h} not divisible into {tx}x{ty} tiles")
    o, dirs = camera.rays(origin)
    if capacity is None:
        from sgrt_tpu.ops.tiling import max_tile_count

        capacity = max_tile_count(scene, camera.view_matrix, tiles)
    # Round up so the q-block scan divides evenly (dummies are inert).
    q_block = min(q_block, max(capacity, 1))
    capacity = max(q_block, -(-capacity // q_block) * q_block)
    img, counts = _render_tiled_jit(
        scene, camera.view_matrix, o, dirs,
        h=h, w=w, tiles=tiles, capacity=capacity, q_block=q_block,
        tile_batch=tile_batch, erf_name=erf_name, exp_name=exp_name,
    )
    if check_overflow and int(jnp.max(counts)) > capacity:
        raise ValueError(
            f"tile capacity {capacity} overflowed (max count {int(jnp.max(counts))}); "
            "raise `capacity`"
        )
    return img
