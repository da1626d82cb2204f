"""Gaussian scene representation.

The scene is a pytree of arrays (structure-of-arrays from the start — the
TPU-native analog of the reference's `gaussian_vec_t` SoA type,
src/vrt/types.h:232-264):

    mu        (N, 3) float32   Gaussian centers
    sigma     (N,)   float32   isotropic standard deviations
    magnitude (N,)   float32   density magnitudes c_q
    albedo    (N, 3) float32   RGB albedo

Padding convention (analog of the reference's SIMD padding, which fills the
SoA tail with sigma=1, magnitude=0 dummies — src/vrt/types.cpp:53-63): padded
entries use sigma=1 (no div-by-zero), magnitude=0 (zero density → zero
contribution to both transmittance and radiance), mu=0, albedo=0.
"""

from __future__ import annotations

import flax.struct
import jax.numpy as jnp
import numpy as np


@flax.struct.dataclass
class GaussianScene:
    """Pytree of N isotropic 3D Gaussians.

    Density of Gaussian q at point x (reference: gaussian_t::pdf,
    src/vrt/types.h:204-208):

        pdf_q(x) = magnitude_q * exp(-||x - mu_q||^2 / (2 sigma_q^2))
    """

    mu: jnp.ndarray         # (N, 3)
    sigma: jnp.ndarray      # (N,)
    magnitude: jnp.ndarray  # (N,)
    albedo: jnp.ndarray     # (N, 3)

    @property
    def n(self) -> int:
        return self.mu.shape[0]

    def pdf(self, x: jnp.ndarray) -> jnp.ndarray:
        """Densities of all Gaussians at point x (3,). Returns (N,)."""
        d2 = jnp.sum((x[None, :] - self.mu) ** 2, axis=-1)
        return self.magnitude * jnp.exp(-d2 / (2.0 * self.sigma**2))


def make_scene(mu, sigma, magnitude, albedo) -> GaussianScene:
    return GaussianScene(
        mu=jnp.asarray(mu, jnp.float32).reshape(-1, 3),
        sigma=jnp.asarray(sigma, jnp.float32).reshape(-1),
        magnitude=jnp.asarray(magnitude, jnp.float32).reshape(-1),
        albedo=jnp.asarray(albedo, jnp.float32).reshape(-1, 3),
    )


def pad_scene(scene: GaussianScene, multiple: int = 128) -> GaussianScene:
    """Pad N up to a multiple (TPU lane alignment) with inert Gaussians.

    sigma=1 / magnitude=0 padding keeps every formula finite while
    contributing exactly zero, mirroring the reference SoA padding semantics
    (src/vrt/types.cpp:53-63).
    """
    n = scene.n
    n_pad = (-n) % multiple
    if n_pad == 0:
        return scene
    return GaussianScene(
        mu=jnp.concatenate([scene.mu, jnp.zeros((n_pad, 3), jnp.float32)]),
        sigma=jnp.concatenate([scene.sigma, jnp.ones((n_pad,), jnp.float32)]),
        magnitude=jnp.concatenate([scene.magnitude, jnp.zeros((n_pad,), jnp.float32)]),
        albedo=jnp.concatenate([scene.albedo, jnp.zeros((n_pad, 3), jnp.float32)]),
    )


def grid_scene(dim: int = 4, sigma: float | None = None, magnitude: float = 1.0) -> GaussianScene:
    """Procedural dim x dim Gaussian grid — the reference's default `-g` scene
    (src/volumetric-ray-tracer/main.cpp:196-205):

        albedo = (1 - t, 0, t), t = (i*dim + j) / dim^2
        mu     = (-1 + 1/dim + i/(dim/2), -1 + 1/dim + j/(dim/2), 1)
        sigma  = 1/(2*dim), magnitude = 1

    The img-error test variant (tests/img-error.cpp:18-26) uses dim=16 with
    sigma=1/4, magnitude=3 — pass those explicitly.
    """
    i, j = np.meshgrid(np.arange(dim), np.arange(dim), indexing="ij")
    t = (i * dim + j).astype(np.float32) / float(dim * dim)
    mu = np.stack(
        [
            -1.0 + 1.0 / dim + i / (dim / 2.0),
            -1.0 + 1.0 / dim + j / (dim / 2.0),
            np.ones_like(t),
        ],
        axis=-1,
    ).reshape(-1, 3)
    albedo = np.stack([1.0 - t, np.zeros_like(t), t], axis=-1).reshape(-1, 3)
    if sigma is None:
        sigma = 1.0 / (2.0 * dim)
    n = dim * dim
    return make_scene(mu, np.full(n, sigma), np.full(n, magnitude), albedo)


def scene_from_vertices(vertices: np.ndarray) -> GaussianScene:
    """Vertices (N,3) → Gaussians, replicating the reference obj-loading rules
    (src/vrt/gaussians-from-file.cpp:26-41):

        sigma: N<300 → 0.3, N<1000 → 0.15, else 0.05  (same for all)
        albedo = 0.5*normalize(position) + 0.5
        magnitude = 1

    A vertex at the exact origin gets a mid-gray albedo (0.5, 0.5, 0.5)
    instead of the reference's undefined glm::normalize(0) (NaN), which
    would otherwise poison the render and the u8 cast.
    """
    v = np.asarray(vertices, np.float32).reshape(-1, 3)
    n = v.shape[0]
    sigma = 0.3 if n < 300 else (0.15 if n < 1000 else 0.05)
    norm = np.sqrt(np.sum(v * v, axis=-1, keepdims=True))
    albedo = 0.5 * np.divide(v, norm, out=np.zeros_like(v), where=norm > 0) + 0.5
    return make_scene(v, np.full(n, sigma), np.ones(n), albedo)


def scene_from_obj(path: str) -> GaussianScene:
    """Load a .obj file's vertices as Gaussians (reference:
    read_from_obj, src/vrt/gaussians-from-file.cpp:7-44)."""
    from sgrt_tpu.utils.objio import read_obj_vertices

    return scene_from_vertices(read_obj_vertices(path))
