"""Un-fused jnp reference implementation — the correctness oracle.

These functions mirror the reference math term-by-term and are the ground
truth every fused/Pallas path is tested against (the analog of the scalar
libm path used as the oracle in the reference's img-error test,
src/volumetric-ray-tracer/tests/img-error.cpp:27-60). They are plain
differentiable jnp, so `jax.grad` of these is also the *gradient* oracle.

Math contract (thesis eqs.; scalar code at src/vrt/rt.h:32-54, 146-164):

  Transmittance along ray o + s*n through Gaussians {a_q, mu_q, sigma_q, c_q}:

      mu_bar_q = (mu_q - o) . n
      cbar_q   = c_q * exp(-(||mu_q - o||^2 - mu_bar_q^2) / (2 sigma_q^2))
      T(s)     = exp( sum_q sigma_q cbar_q sqrt(pi/2)
                      * (erf(-mu_bar_q/(sqrt2 sigma_q))
                         - erf((s - mu_bar_q)/(sqrt2 sigma_q))) )

  (erf1 - erf2 is negative for s > 0, so the exponent is negative.)

  Radiance (5-point footprint quadrature, k in {-4..0}, lambda_q = sigma_q):

      L = sum_q a_q sum_k lambda_q * pdf_q(o + s_qk n) * T(s_qk),
      s_qk = mu_bar_q + k * lambda_q
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.scipy.special import erf

from sgrt_tpu.models.camera import Camera
from sgrt_tpu.models.gaussians import GaussianScene

# Constants as in src/vrt/rt.h:18-20.
SQRT_2_PI = 0.7978845608028654  # sqrt(2/pi)
INV_SQRT_2_PI = 1.0 / SQRT_2_PI  # = sqrt(pi/2)
SQRT_2 = 1.4142135623730951

# numpy, not jnp: module import must not initialize the XLA backend
# (jax.distributed.initialize must run before any backend use)
K_TAPS = np.arange(-4.0, 1.0, dtype=np.float32)  # k in {-4,...,0}


def _per_gaussian_terms(o: jnp.ndarray, n: jnp.ndarray, scene: GaussianScene):
    """Per-Gaussian ray geometry shared by transmittance and radiance."""
    oc = scene.mu - o[None, :]                      # (N,3)
    mu_bar = jnp.matmul(oc, n, precision=jax.lax.Precision.HIGHEST)  # (N,)
    oc_sq = jnp.sum(oc * oc, axis=-1)               # (N,)
    inv_2s2 = 1.0 / (2.0 * scene.sigma**2)
    cbar = scene.magnitude * jnp.exp(-(oc_sq - mu_bar**2) * inv_2s2)
    return mu_bar, cbar


def transmittance(o, n, s, scene: GaussianScene) -> jnp.ndarray:
    """Closed-form transmittance at o + s*n (scalar). rt.h:32-54."""
    mu_bar, cbar = _per_gaussian_terms(o, n, scene)
    inv = 1.0 / (SQRT_2 * scene.sigma)
    erf1 = erf(-mu_bar * inv)
    erf2 = erf((s - mu_bar) * inv)
    t = jnp.sum(scene.sigma * cbar * INV_SQRT_2_PI * (erf1 - erf2))
    return jnp.exp(t)


def transmittance_step(o, n, s, delta, scene: GaussianScene) -> jnp.ndarray:
    """Riemann-sum numerical transmittance (debug integrator, rt.cpp:8-17).

    Sums density at t = 0, delta, 2*delta, ... <= s and returns exp(-sum*delta).
    `s` and `delta` must be Python floats (static number of steps).
    """
    ts = jnp.arange(0.0, float(s) + 1e-9, float(delta))
    pts = o[None, :] + ts[:, None] * n[None, :]     # (S,3)
    d2 = jnp.sum((pts[:, None, :] - scene.mu[None, :, :]) ** 2, axis=-1)
    dens = scene.magnitude[None, :] * jnp.exp(-d2 / (2.0 * scene.sigma**2)[None, :])
    return jnp.exp(-delta * jnp.sum(dens))


def density(pt, scene: GaussianScene) -> jnp.ndarray:
    """Combined density at a point (rt.cpp:19-27)."""
    return jnp.sum(scene.pdf(jnp.asarray(pt, jnp.float32)))


def radiance(o, n, scene: GaussianScene) -> jnp.ndarray:
    """Radiance (RGB) along one ray — literal 5-tap quadrature (rt.h:146-164).

    Keeps the explicit pdf evaluation at o + s*n so it can serve as the
    oracle for algebraically simplified fast paths.
    """
    mu_bar, _ = _per_gaussian_terms(o, n, scene)
    lam = scene.sigma                                # lambda_q = sigma_q
    s_pk = mu_bar[:, None] + K_TAPS[None, :] * lam[:, None]   # (N,5)

    t_fn = jax.vmap(jax.vmap(lambda s: transmittance(o, n, s, scene)))
    T = t_fn(s_pk)                                   # (N,5)

    pts = o[None, None, :] + s_pk[..., None] * n[None, None, :]   # (N,5,3)
    d2 = jnp.sum((pts - scene.mu[:, None, :]) ** 2, axis=-1)
    pdf = scene.magnitude[:, None] * jnp.exp(-d2 / (2.0 * scene.sigma**2)[:, None])

    inner = jnp.sum(pdf * T * lam[:, None], axis=-1)  # (N,)
    return jnp.matmul(inner, scene.albedo, precision=jax.lax.Precision.HIGHEST)


def render_rays_reference(o, dirs, scene: GaussianScene, chunk: int = 16) -> jnp.ndarray:
    """Oracle render of a batch of rays: dirs (R,3) → colors (R,3).

    Chunked with lax.map to bound the O(chunk * N^2 * 5) intermediate.
    """
    r = dirs.shape[0]
    pad = (-r) % chunk
    dirs_p = jnp.concatenate([dirs, jnp.zeros((pad, 3), dirs.dtype)]) if pad else dirs
    batches = dirs_p.reshape(-1, chunk, 3)
    f = jax.vmap(lambda n: radiance(o, n, scene))
    colors = jax.lax.map(f, batches).reshape(-1, 3)
    return colors[:r]


def render_reference(scene: GaussianScene, camera: Camera, origin=None, chunk: int = 16) -> jnp.ndarray:
    """Full-frame oracle render → float32 (H, W, 3), values unclamped.

    Equivalent of render_image<radiance<transmittance>> (rt.h:227-247) minus
    the u32 packing (see sgrt_tpu.ops.packing for the exact quantization).
    """
    o, dirs = camera.rays(origin)
    colors = render_rays_reference(o, dirs, scene, chunk=chunk)
    return colors.reshape(camera.height, camera.width, 3)
