"""Pallas kernel vs jnp-oracle tests (interpret mode on the CPU rig).

The analog of the reference's img-error test (tests/img-error.cpp:27-60):
the fused kernel must match the un-fused oracle. Gradient checks are NEW
capability (the reference is forward-only, SURVEY §0).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sgrt_tpu.models.camera import Camera
from sgrt_tpu.models.gaussians import grid_scene
from sgrt_tpu.ops.pallas_kernel import (
    render_rays_pallas_impl,
    render_tiles_pallas,
    tw_pallas,
)
from sgrt_tpu.ops.reference import render_rays_reference
from sgrt_tpu.ops.render import render_rays_impl


@pytest.fixture(scope="module")
def small_setup():
    scene = grid_scene(16, sigma=0.25, magnitude=3.0)  # img-error scene
    cam = Camera.create(position=(0.0, 0.0, -4.0), width=16, height=16)
    o, dirs = cam.rays()
    return scene, o, dirs


def test_pallas_forward_matches_oracle(small_setup):
    scene, o, dirs = small_setup
    pal = render_rays_pallas_impl(o, dirs, scene, interpret=True)
    ref = render_rays_reference(o, dirs, scene)
    np.testing.assert_allclose(np.asarray(pal), np.asarray(ref), atol=2e-5)


def test_pallas_forward_multiblock(small_setup):
    """Exercise ray-block and q/p-block loops (rb < R, blocks < N)."""
    scene, o, dirs = small_setup
    pal = render_rays_pallas_impl(
        o, dirs, scene, rb=128, pb=16, qb=32, interpret=True
    )
    fused = render_rays_impl(o, dirs, scene, q_block=64, ray_block=128)
    np.testing.assert_allclose(np.asarray(pal), np.asarray(fused), atol=2e-5)


def test_pallas_gradients_match_autodiff_oracle(small_setup):
    """Custom VJP vs jax.grad of the jnp path — every scene parameter."""
    scene, o, dirs = small_setup

    def loss_pal(s):
        return jnp.sum(
            render_rays_pallas_impl(o, dirs, s, interpret=True) ** 2
        )

    def loss_jnp(s):
        return jnp.sum(render_rays_impl(o, dirs, s, q_block=64, ray_block=128) ** 2)

    gp = jax.grad(loss_pal)(scene)
    gj = jax.grad(loss_jnp)(scene)
    for f in ("mu", "sigma", "magnitude", "albedo"):
        a, b = np.asarray(getattr(gp, f)), np.asarray(getattr(gj, f))
        scale = max(np.abs(b).max(), 1e-8)
        np.testing.assert_allclose(a / scale, b / scale, atol=5e-5, err_msg=f)


def test_tw_pallas_counts_prefix_semantics():
    """counts < N must reproduce the result of physically truncating the
    batch entry to its first `count` Gaussians (the per-tile live prefix)."""
    rng = np.random.default_rng(3)
    B, R, N, count = 2, 128, 256, 100
    mu_bar = jnp.asarray(rng.normal(0, 1, (B, N, R)), jnp.float32)
    coeff = jnp.asarray(rng.uniform(0, 0.02, (B, N, R)), jnp.float32)
    sigma = jnp.asarray(rng.uniform(0.2, 0.4, (B, N)), jnp.float32)
    inv = 1.0 / (np.sqrt(2.0) * sigma)
    # zero coeff beyond the live prefix (the gather's dummy padding contract)
    mask = (np.arange(N) < count)[None, :, None]
    coeff = coeff * mask
    counts = jnp.full((B,), count, jnp.int32)

    out = tw_pallas(mu_bar, coeff, sigma, inv, counts, interpret=True)
    full = tw_pallas(mu_bar, coeff, sigma, inv, None, interpret=True)
    # live rows must agree with the count-free computation
    np.testing.assert_allclose(
        np.asarray(out)[:, :count], np.asarray(full)[:, :count],
        rtol=2e-5, atol=2e-5,
    )


def test_pallas_tiled_frame_matches_xla_tiled_frame():
    from sgrt_tpu.ops.frame import render_orbit_frame

    scene = grid_scene(8)
    kw = dict(width=64, height=64, tiles=4, capacity=64)
    img_p, _ = render_orbit_frame(scene, 23.0, backend="pallas", **kw)
    img_x, _ = render_orbit_frame(scene, 23.0, backend="xla", **kw)
    np.testing.assert_allclose(
        np.asarray(img_p), np.asarray(img_x), atol=2e-5
    )


def test_pallas_fit_step_converges():
    """One adam step through the custom VJP reduces the loss (end-to-end
    trainability of the Pallas path)."""
    import optax

    scene = grid_scene(4)
    cam = Camera.create(position=(0.0, 0.0, -4.0), width=16, height=16)
    o, dirs = cam.rays()
    target = render_rays_impl(o, dirs, scene, q_block=16, ray_block=256)

    noisy = scene.replace(mu=scene.mu + 0.05)
    opt = optax.adam(5e-3)

    def loss_fn(s):
        pred = render_rays_pallas_impl(o, dirs, s, interpret=True)
        return jnp.mean((pred - target) ** 2)

    state = opt.init(noisy)
    l0, grads = jax.value_and_grad(loss_fn)(noisy)
    updates, state = opt.update(grads, state, noisy)
    stepped = optax.apply_updates(noisy, updates)
    l1 = loss_fn(stepped)
    assert float(l1) < float(l0)
