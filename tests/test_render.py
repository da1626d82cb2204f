"""Fused renderer vs the oracle — the analog of the reference's img-error
test (tests/img-error.cpp), but asserting allclose in float instead of
per-pixel MSE of quantized u32."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sgrt_tpu.models.camera import Camera
from sgrt_tpu.models.gaussians import grid_scene, make_scene
from sgrt_tpu.ops import reference as ref
from sgrt_tpu.ops.render import render_rays, render


@pytest.fixture
def random_scene():
    rng = np.random.default_rng(0)
    n = 24
    return make_scene(
        mu=rng.uniform(-1, 1, (n, 3)) + np.array([0, 0, 2.0]),
        sigma=rng.uniform(0.1, 0.5, n),
        magnitude=rng.uniform(0.2, 2.0, n),
        albedo=rng.uniform(0, 1, (n, 3)),
    )


def _random_rays(r, seed=1):
    rng = np.random.default_rng(seed)
    d = rng.normal(size=(r, 3)) * 0.15 + np.array([0, 0, 1.0])
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(d, jnp.float32)


def test_render_rays_matches_oracle(random_scene):
    o = jnp.zeros(3)
    dirs = _random_rays(40)
    fast = render_rays(o, dirs, random_scene, q_block=8, ray_block=16)
    oracle = ref.render_rays_reference(o, dirs, random_scene, chunk=8)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(oracle), rtol=2e-3, atol=2e-5)


def test_render_full_frame_matches_oracle():
    scene = grid_scene(4)
    cam = Camera.create(position=(0.0, 0.0, -4.0), width=16, height=16)
    fast = render(scene, cam, q_block=16, ray_block=64)
    oracle = ref.render_reference(scene, cam, chunk=16)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(oracle), rtol=2e-3, atol=2e-5)


def test_render_grid_image_nontrivial():
    """Default -g scene renders something visible (sanity for camera chain)."""
    scene = grid_scene(4)
    cam = Camera.create(position=(0.0, 0.0, -4.0), width=32, height=32)
    img = np.asarray(render(scene, cam, q_block=16, ray_block=256))
    assert img.shape == (32, 32, 3)
    assert img.max() > 0.05
    assert np.all(np.isfinite(img))


def test_render_rays_gradients_match_oracle(random_scene):
    o = jnp.zeros(3)
    dirs = _random_rays(8, seed=3)

    def loss_fast(s):
        return jnp.sum(render_rays(o, dirs, s, q_block=8, ray_block=8) ** 2)

    def loss_oracle(s):
        return jnp.sum(ref.render_rays_reference(o, dirs, s, chunk=8) ** 2)

    gf = jax.grad(loss_fast)(random_scene)
    go = jax.grad(loss_oracle)(random_scene)
    for a, b in zip(jax.tree_util.tree_leaves(gf), jax.tree_util.tree_leaves(go)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-3, atol=1e-4)


def test_origin_gradient_finite_with_ray_padding():
    """render_rays pads ray batches up to ray_block; the dead rays' forward
    intermediates must not poison the gradient of the SHARED origin (the
    same 0*inf=NaN failure fixed in render_rays_pallas_impl — a non-unit
    pad direction lets mu_bar^2 exceed oc_sq and cbar's exp overflow)."""
    scene = grid_scene(3)
    cam = Camera.create(position=(0.0, 0.0, -4.0), width=16, height=16)
    o, dirs = cam.rays()

    def loss(o):
        return jnp.sum(render_rays(o, dirs, scene, q_block=16, ray_block=2048))

    g = jax.grad(loss)(o)             # 256 live rays, 1792 padded
    assert bool(jnp.all(jnp.isfinite(g))), g
