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


def test_pallas_ray_direction_gradient(small_setup):
    """ddirs from the fused kernel's analytic VJP vs autodiff of the XLA
    path — camera optimization support (r1 VERDICT: was a silent zero)."""
    scene, o, dirs = small_setup

    def loss_pal(d):
        return jnp.sum(render_rays_pallas_impl(o, d, scene, interpret=True) ** 2)

    def loss_jnp(d):
        return jnp.sum(render_rays_impl(o, d, scene, q_block=64, ray_block=128) ** 2)

    gp = np.asarray(jax.grad(loss_pal)(dirs))
    gj = np.asarray(jax.grad(loss_jnp)(dirs))
    scale = max(np.abs(gj).max(), 1e-8)
    assert np.abs(gp).max() > 0  # actually flows
    np.testing.assert_allclose(gp / scale, gj / scale, atol=5e-5)


def test_pallas_finite_difference_gradients():
    """jax.test_util.check_grads (finite differences) on render_fused —
    SURVEY §4(c). Tiny scene keeps the f64-free FD noise manageable."""
    from jax.test_util import check_grads

    from sgrt_tpu.ops.pallas_kernel import render_fused

    rng = np.random.default_rng(7)
    n, r = 16, 128
    oc = jnp.asarray(rng.normal(0, 1.5, (1, n, 3)), jnp.float32)
    sigma = jnp.asarray(rng.uniform(0.3, 0.6, (1, n)), jnp.float32)
    mag = jnp.asarray(rng.uniform(0.5, 1.5, (1, n)), jnp.float32)
    albedo = jnp.asarray(rng.uniform(0, 1, (1, n, 3)), jnp.float32)
    d = rng.normal(0, 1, (r, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    dirs_t = jnp.asarray(d.T[None], jnp.float32)

    def f(oc_, sigma_, mag_, albedo_, dirs_):
        return render_fused(oc_, sigma_, mag_, albedo_, dirs_, None,
                            pb=8, qb=8, interpret=True)

    check_grads(f, (oc, sigma, mag, albedo, dirs_t), order=1,
                modes=("rev",), atol=2e-2, rtol=2e-2)


def test_pallas_counts_bounded_backward_matches_truncated():
    """Gradient parity of the counts-bounded backward (dynamic np/nq trip
    counts) against physically truncating the batch to `count` Gaussians —
    the backward analog of test_tw_pallas_counts_prefix_semantics."""
    from sgrt_tpu.models.gaussians import GaussianScene, pad_scene
    from sgrt_tpu.ops.pallas_kernel import render_fused

    rng = np.random.default_rng(11)
    cap, live, r = 64, 37, 128
    mu = rng.normal(0, 1.0, (live, 3)).astype(np.float32)
    scene = GaussianScene(
        mu=jnp.asarray(mu),
        sigma=jnp.asarray(rng.uniform(0.3, 0.6, live), jnp.float32),
        magnitude=jnp.asarray(rng.uniform(0.5, 1.5, live), jnp.float32),
        albedo=jnp.asarray(rng.uniform(0, 1, (live, 3)), jnp.float32),
    )
    padded = pad_scene(scene, cap)  # inert dummies up to cap
    d = rng.normal(0, 1, (r, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    dirs_t = jnp.asarray(d.T[None], jnp.float32)
    counts = jnp.asarray([live], jnp.int32)

    def loss_counted(s):
        c = render_fused(s.mu[None], s.sigma[None], s.magnitude[None],
                         s.albedo[None], dirs_t, counts, pb=8, qb=8,
                         interpret=True)
        return jnp.sum(c ** 2)

    def loss_full(s):
        # same padded scene, no counts: full-capacity static loops
        c = render_fused(s.mu[None], s.sigma[None], s.magnitude[None],
                         s.albedo[None], dirs_t, None, pb=8, qb=8,
                         interpret=True)
        return jnp.sum(c ** 2)

    g_c = jax.grad(loss_counted)(padded)
    g_f = jax.grad(loss_full)(padded)
    for f in ("mu", "sigma", "magnitude", "albedo"):
        a = np.asarray(getattr(g_c, f))[:live]
        b = np.asarray(getattr(g_f, f))[:live]
        scale = max(np.abs(b).max(), 1e-8)
        np.testing.assert_allclose(a / scale, b / scale, atol=1e-5,
                                   err_msg=f)


def test_save_t_backward_matches_recompute():
    """The saved-T backward (forward materializes T_k, backward skips the
    pass-A recompute) must produce identical gradients to the flash-style
    recompute backward, including with counts < N."""
    from sgrt_tpu.ops.pallas_kernel import render_fused

    rng = np.random.default_rng(13)
    cap, live, r = 32, 21, 128
    oc = jnp.asarray(rng.normal(0, 1.5, (2, cap, 3)), jnp.float32)
    sigma = jnp.asarray(rng.uniform(0.3, 0.6, (2, cap)), jnp.float32)
    mag = jnp.asarray(rng.uniform(0.5, 1.5, (2, cap)), jnp.float32)
    mask = (np.arange(cap) < live)[None, :]
    mag = mag * mask  # inert beyond the live prefix
    albedo = jnp.asarray(rng.uniform(0, 1, (2, cap, 3)), jnp.float32)
    d = rng.normal(0, 1, (r, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    dirs_t = jnp.asarray(np.stack([d.T, d.T]), jnp.float32)
    counts = jnp.asarray([live, cap], jnp.int32)

    def loss(args, save_t):
        oc_, sig_, mag_, alb_, dirs_ = args
        c = render_fused(oc_, sig_, mag_, alb_, dirs_, counts, pb=8, qb=8,
                         save_t=save_t, interpret=True)
        return jnp.sum(c ** 2)

    args = (oc, sigma, mag, albedo, dirs_t)
    g_s = jax.grad(lambda a: loss(a, True))(args)
    g_r = jax.grad(lambda a: loss(a, False))(args)
    for name, a, b in zip(("oc", "sigma", "mag", "albedo", "dirs"), g_s, g_r):
        scale = max(np.abs(np.asarray(b)).max(), 1e-8)
        np.testing.assert_allclose(np.asarray(a) / scale,
                                   np.asarray(b) / scale, atol=1e-5,
                                   err_msg=name)


def test_frame_loss_finite_difference_gradients():
    """check_grads through the full tiled frame loss (tiling + gather +
    fused kernel + scatter-add transpose). Tile membership (tile_indices)
    is a non-differentiable index computation, so it is frozen outside the
    differentiated function — exactly how make_frame_value_and_grad
    composes it."""
    from jax.test_util import check_grads

    from sgrt_tpu.ops.frame import orbit_camera
    from sgrt_tpu.ops.pallas_kernel import render_tiles_pallas
    from sgrt_tpu.ops.render import _tile_rays
    from sgrt_tpu.ops.tiling import gather_tiles, tile_indices

    scene = grid_scene(4)
    cam = orbit_camera(20.0, -4.0, 1.0, 32, 32)
    o, dirs = cam.rays()
    idx, counts = tile_indices(scene, cam.view_matrix, 2, 16)
    d = _tile_rays(dirs, 32, 32, 2)
    target = jnp.zeros((4, 256, 3), jnp.float32)

    def loss(s):
        colors = render_tiles_pallas(gather_tiles(s, idx), o, d, counts,
                                     pb=8, qb=8, interpret=True)
        return jnp.mean((colors - target) ** 2)

    check_grads(loss, (scene,), order=1, modes=("rev",), atol=2e-2, rtol=2e-2)


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


def test_negative_magnitude_gradient_sign():
    """A magnitude driven NEGATIVE by unconstrained fitting must keep the
    true-signed d mag = sum(dco*co)/mag (advisor round-4: the old
    `mag > 0` guard silently rescaled/flipped negative-magnitude grads)."""
    scene = grid_scene(2, sigma=0.4, magnitude=1.5)
    scene = scene.replace(
        magnitude=scene.magnitude.at[1].set(-0.7))
    cam = Camera.create(position=(0.0, 0.0, -3.0), width=8, height=8)
    o, dirs = cam.rays()

    def loss_pal(s):
        return jnp.sum(render_rays_pallas_impl(o, dirs, s, interpret=True) ** 2)

    def loss_jnp(s):
        return jnp.sum(render_rays_impl(o, dirs, s, q_block=8, ray_block=64) ** 2)

    gp = np.asarray(jax.grad(loss_pal)(scene).magnitude)
    gj = np.asarray(jax.grad(loss_jnp)(scene).magnitude)
    scale = max(np.abs(gj).max(), 1e-8)
    np.testing.assert_allclose(gp / scale, gj / scale, atol=5e-5)
