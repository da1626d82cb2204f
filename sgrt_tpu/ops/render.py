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
from jax.scipy.special import erf

from sgrt_tpu.models.camera import Camera
from sgrt_tpu.models.gaussians import GaussianScene, pad_scene
from sgrt_tpu.ops.reference import INV_SQRT_2_PI, K_TAPS, SQRT_2

# w_k = exp(-k^2/2) for k in {-4..0} — the collapsed pdf factors.
K_WEIGHTS = jnp.exp(-(K_TAPS**2) / 2.0)


def _ray_gaussian_terms(o, dirs, scene: GaussianScene):
    """Shared per-(ray, Gaussian) precomputation.

    dirs: (R,3). Returns mu_bar (R,N), cbar (R,N), coeff (R,N), inv (N,),
    base (R,) where base = sum_q coeff*erf1.
    """
    oc = scene.mu - o[None, :]                     # (N,3)
    oc_sq = jnp.sum(oc * oc, axis=-1)              # (N,)
    # mu_bar feeds erf arguments — needs full f32, not TPU's default bf16 matmul.
    mu_bar = jnp.matmul(dirs, oc.T, precision=jax.lax.Precision.HIGHEST)  # (R,N)
    inv_2s2 = 1.0 / (2.0 * scene.sigma**2)         # (N,)
    cbar = scene.magnitude[None, :] * jnp.exp(
        -(oc_sq[None, :] - mu_bar**2) * inv_2s2[None, :]
    )
    coeff = (scene.sigma * INV_SQRT_2_PI)[None, :] * cbar
    inv = 1.0 / (SQRT_2 * scene.sigma)             # (N,)
    base = jnp.sum(coeff * erf(-mu_bar * inv[None, :]), axis=-1)  # (R,)
    return mu_bar, cbar, coeff, inv, base


def _radiance_block(o, dirs, scene: GaussianScene, q_block: int) -> jnp.ndarray:
    """Radiance for one block of rays: dirs (R,3) → (R,3).

    The O(R * 5N * N) erf reduction runs as a lax.scan over q-blocks so the
    pairwise intermediate stays (R, q_block, 5N).
    """
    n = scene.n
    mu_bar, cbar, coeff, inv, base = _ray_gaussian_terms(o, dirs, scene)

    # Sample points s(r, p, k) = mu_bar(r,p) + k*sigma_p, flattened to (R, 5N).
    s = (mu_bar[:, :, None] + K_TAPS[None, None, :] * scene.sigma[None, :, None])
    s = s.reshape(dirs.shape[0], n * 5)

    nq = n // q_block
    mu_bar_b = mu_bar.T.reshape(nq, q_block, -1)    # (nq, Qb, R)
    coeff_b = coeff.T.reshape(nq, q_block, -1)
    inv_b = inv.reshape(nq, q_block)

    def body(acc, blk):
        mu_q, co_q, inv_q = blk                     # (Qb,R), (Qb,R), (Qb,)
        # (R, Qb, 5N): the only pairwise intermediate.
        args = (s[:, None, :] - mu_q.T[:, :, None]) * inv_q[None, :, None]
        acc = acc + jnp.sum(co_q.T[:, :, None] * erf(args), axis=1)
        return acc, None

    acc0 = jnp.zeros_like(s)
    acc, _ = jax.lax.scan(body, acc0, (mu_bar_b, coeff_b, inv_b))

    T = jnp.exp(base[:, None] - acc).reshape(-1, n, 5)       # (R,N,5)
    tw = jnp.matmul(T, K_WEIGHTS, precision=jax.lax.Precision.HIGHEST)  # (R,N)
    weights = scene.sigma[None, :] * cbar * tw                # (R,N)
    return jnp.matmul(weights, scene.albedo, precision=jax.lax.Precision.HIGHEST)


@functools.partial(jax.jit, static_argnames=("q_block", "ray_block"))
def render_rays(o, dirs, scene: GaussianScene, q_block: int = 128, ray_block: int = 2048):
    """Render a batch of rays → colors (R,3). Scene must be padded already
    if N % q_block != 0 (pad_scene handles it)."""
    scene = pad_scene(scene, q_block)
    r = dirs.shape[0]
    pad = (-r) % ray_block
    dirs_p = jnp.concatenate([dirs, jnp.ones((pad, 3), dirs.dtype)]) if pad else dirs
    batches = dirs_p.reshape(-1, ray_block, 3)
    f = lambda d: _radiance_block(o, d, scene, q_block)
    colors = jax.lax.map(f, batches).reshape(-1, 3)
    return colors[:r]


def render(scene: GaussianScene, camera: Camera, origin=None,
           q_block: int = 128, ray_block: int = 2048) -> jnp.ndarray:
    """Full-frame fused render → float32 (H, W, 3), unclamped."""
    o, dirs = camera.rays(origin)
    colors = render_rays(o, dirs, scene, q_block=q_block, ray_block=ray_block)
    return colors.reshape(camera.height, camera.width, 3)
