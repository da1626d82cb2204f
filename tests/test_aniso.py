"""Anisotropic (diagonal-covariance) Gaussians — oracle-based tests.

Strategy mirrors the isotropic suite (SURVEY §4): numerical Riemann
integration validates the closed form; the literal-quadrature oracle
validates the fused path; autodiff of the oracle validates gradients; the
isotropic embedding must reproduce the isotropic renderer exactly."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sgrt_tpu.models.camera import Camera
from sgrt_tpu.models.gaussians import grid_scene, make_scene
from sgrt_tpu.ops import anisotropic as an
from sgrt_tpu.ops.render import render_rays_impl


def _aniso_scene():
    rng = np.random.default_rng(7)
    n = 8
    mu = rng.uniform(-0.8, 0.8, (n, 3)).astype(np.float32)
    mu[:, 2] = rng.uniform(0.5, 1.5, n)
    scale = rng.uniform(0.08, 0.4, (n, 3)).astype(np.float32)
    mag = rng.uniform(0.5, 1.5, n).astype(np.float32)
    alb = rng.uniform(0.0, 1.0, (n, 3)).astype(np.float32)
    return an.AnisoScene(mu=jnp.asarray(mu), scale=jnp.asarray(scale),
                         magnitude=jnp.asarray(mag), albedo=jnp.asarray(alb))


SCENE = _aniso_scene()
CAM = Camera.create(position=(0.0, 0.0, -2.5), width=16, height=16)


def test_closed_form_matches_riemann():
    """Closed-form anisotropic transmittance vs numerical integration along
    a ray (the transmittance-test analog, tests/transmittance.cpp:7-38)."""
    o = jnp.array([0.1, -0.2, -2.5], jnp.float32)
    n = jnp.array([0.05, 0.02, 1.0], jnp.float32)
    n = n / jnp.linalg.norm(n)
    for s in (1.0, 2.5, 4.0):
        closed = float(an.transmittance_aniso(o, n, s, SCENE))
        numeric = float(an.transmittance_step_aniso(o, n, s, 1e-3, SCENE))
        assert abs(closed - numeric) < 2e-3, (s, closed, numeric)


def test_isotropic_embedding_matches_isotropic_renderer():
    """scale = (sigma, sigma, sigma) must reproduce the isotropic fused
    renderer to numerical noise."""
    iso = grid_scene(3)
    o, dirs = CAM.rays()
    a = np.asarray(render_rays_impl(o, dirs, iso, q_block=16, ray_block=64))
    b = np.asarray(an.render_rays_aniso_impl(o, dirs, an.from_isotropic(iso),
                                             q_block=16, ray_block=64))
    np.testing.assert_allclose(b, a, rtol=1e-4, atol=1e-6)


def test_fused_matches_oracle():
    """Fused blocked anisotropic renderer vs the literal 5-tap oracle with
    explicit matrix-form pdfs (img-error methodology)."""
    o, dirs = CAM.rays()
    oracle = jax.lax.map(
        lambda n: an.radiance_aniso(o, n, SCENE), dirs)
    fused = an.render_rays_aniso_impl(o, dirs, SCENE, q_block=8,
                                      ray_block=64)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(oracle),
                               rtol=1e-4, atol=1e-6)


def test_anisotropy_changes_the_image():
    """Stretching one axis must actually change pixels (guards against the
    scales being silently ignored)."""
    o, dirs = CAM.rays()
    base = np.asarray(an.render_rays_aniso_impl(o, dirs, SCENE, q_block=8,
                                                ray_block=64))
    stretched = SCENE.replace(scale=SCENE.scale * jnp.array([3.0, 1.0, 1.0]))
    img2 = np.asarray(an.render_rays_aniso_impl(o, dirs, stretched,
                                                q_block=8, ray_block=64))
    assert float(np.mean((base - img2) ** 2)) > 1e-6


def test_gradients_match_oracle_autodiff():
    """Autodiff of the fused path vs autodiff of the independent oracle —
    including the NEW per-axis scale gradients."""
    o, dirs = CAM.rays()
    dirs = dirs[:32]
    target = jnp.zeros((32, 3), jnp.float32)

    def loss_fused(s):
        c = an.render_rays_aniso_impl(o, dirs, s, q_block=8, ray_block=32)
        return jnp.mean((c - target) ** 2)

    def loss_oracle(s):
        c = jax.lax.map(lambda n: an.radiance_aniso(o, n, s), dirs)
        return jnp.mean((c - target) ** 2)

    gf = jax.grad(loss_fused)(SCENE)
    go = jax.grad(loss_oracle)(SCENE)
    for f in ("mu", "scale", "magnitude", "albedo"):
        a, b = np.asarray(getattr(gf, f)), np.asarray(getattr(go, f))
        assert np.all(np.isfinite(a)), f
        np.testing.assert_allclose(a, b, rtol=5e-3, atol=1e-7,
                                   err_msg=f)
    assert float(np.abs(np.asarray(gf.scale)).max()) > 0


def test_tiled_aniso_matches_untiled():
    """Tiled path (max-scale conservative culling) vs the untiled fused
    renderer on a full frame."""
    cam = Camera.create(position=(0.0, 0.0, -2.5), width=32, height=32)
    untiled = an.render_aniso(SCENE, cam, q_block=8, ray_block=256)
    tiled, ovf = an.render_tiled_aniso(SCENE, cam, tiles=4, capacity=8,
                                       q_block=8)
    assert int(ovf) == 0
    # tiling culls 3.3-sigma-distant Gaussians by design; the bound is
    # derived from 8-bit visibility (thesis main.tex:520-541), so the
    # tiled image may differ by up to one u8 quantum (1/255).
    assert float(np.abs(np.asarray(tiled) - np.asarray(untiled)).max()) \
        < 1.0 / 255.0


def test_pallas_aniso_matches_xla():
    """The fused anisotropic Pallas kernel (per-(Gaussian, ray) sigma_bar
    planes) vs the XLA formulation — forward pixels."""
    from sgrt_tpu.ops.pallas_aniso import render_rays_pallas_aniso_impl

    o, dirs = CAM.rays()
    ref = np.asarray(an.render_rays_aniso_impl(o, dirs, SCENE, q_block=8,
                                               ray_block=64))
    ker = np.asarray(render_rays_pallas_aniso_impl(o, dirs, SCENE,
                                                   interpret=True))
    np.testing.assert_allclose(ker, ref, rtol=1e-4, atol=1e-5)


def test_pallas_aniso_gradients_match_xla():
    """The in-kernel analytic VJP — incl. the quadratic-form epilogue that
    chains plane cotangents to (d oc, d invd->d scale, d mag, d albedo) —
    vs autodiff of the XLA path."""
    from sgrt_tpu.ops.pallas_aniso import render_rays_pallas_aniso_impl

    o, dirs = CAM.rays()
    target = jnp.zeros((dirs.shape[0], 3), jnp.float32)

    def lk(s):
        c = render_rays_pallas_aniso_impl(o, dirs, s, interpret=True)
        return jnp.mean((c - target) ** 2)

    def lx(s):
        c = an.render_rays_aniso_impl(o, dirs, s, q_block=8, ray_block=64)
        return jnp.mean((c - target) ** 2)

    gk, gx = jax.grad(lk)(SCENE), jax.grad(lx)(SCENE)
    for f in ("mu", "scale", "magnitude", "albedo"):
        a, b = np.asarray(getattr(gk, f)), np.asarray(getattr(gx, f))
        assert np.all(np.isfinite(a)), f
        denom = max(float(np.abs(b).max()), 1e-12)
        assert float(np.abs(a - b).max() / denom) < 1e-3, f


def test_pallas_aniso_tiled_counts():
    """Count-bounded per-tile dispatch: per-tile live counts must bound the
    computation (inert rows beyond the count contribute nothing)."""
    from sgrt_tpu.ops.pallas_aniso import render_tiles_pallas_aniso

    padded = an.pad_scene_aniso(SCENE, 16)   # K = 16, live count = 8
    tiled = jax.tree_util.tree_map(lambda a: a[None], padded)
    o, dirs = CAM.rays()
    d = dirs[:128][None]                                  # (1, 128, 3)
    counts = jnp.array([SCENE.n], jnp.int32)
    out = render_tiles_pallas_aniso(tiled, o, d, counts, pb=8, qb=8,
                                    interpret=True)
    ref = an.render_rays_aniso_impl(o, dirs[:128], SCENE, q_block=8,
                                    ray_block=128)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_aniso_frame_train_step_descends():
    """Tiled whole-frame anisotropic train step (fused kernel fwd +
    analytic-VJP bwd) reduces loss; overflow stays 0."""
    import optax

    from sgrt_tpu.ops.frame import orbit_camera
    from sgrt_tpu.parallel.fit import init_state, make_aniso_frame_train_step

    from sgrt_tpu.models.gaussians import grid_scene

    truth = an.from_isotropic(grid_scene(3))
    cam = orbit_camera(0.0, -4.0, 1.0, 32, 32)
    o, dirs = cam.rays()
    target, ovf = an.render_tiled_aniso(truth, cam, tiles=4, capacity=16,
                                        backend="pallas")
    assert int(ovf) == 0
    noisy = truth.replace(scale=truth.scale * jnp.array([[1.5, 0.7, 1.0]]))
    opt = optax.adam(2e-2)
    step = make_aniso_frame_train_step(opt, width=32, height=32, tiles=4,
                                       capacity=16)
    state = init_state(noisy, opt)
    first = None
    for _ in range(25):
        state, loss, ovf = step(state, cam.view_matrix, o, dirs, target)
        assert int(ovf) == 0
        if first is None:
            first = float(loss)
    assert float(loss) < first * 0.5, (first, float(loss))


def test_aniso_sharded_step_matches_single():
    """Mesh (8 virtual devices) aniso step: loss parity vs single-device."""
    import optax

    from sgrt_tpu.models.gaussians import grid_scene
    from sgrt_tpu.ops.frame import orbit_camera
    from sgrt_tpu.parallel.fit import init_state, make_aniso_frame_train_step
    from sgrt_tpu.parallel.mesh import make_mesh

    assert len(jax.devices()) == 8
    mesh = make_mesh()
    truth = an.from_isotropic(grid_scene(3))
    noisy = truth.replace(magnitude=truth.magnitude * 0.7)
    cam = orbit_camera(0.0, -4.0, 1.0, 32, 32)
    o, dirs = cam.rays()
    target, _ = an.render_tiled_aniso(truth, cam, tiles=4, capacity=16,
                                      backend="pallas")
    opt = optax.sgd(0.0)
    s_single = make_aniso_frame_train_step(opt, width=32, height=32,
                                           tiles=4, capacity=16)
    s_mesh = make_aniso_frame_train_step(opt, width=32, height=32, tiles=4,
                                         capacity=16, mesh=mesh)
    st0 = init_state(noisy, opt)
    _, l0, _ = s_single(st0, cam.view_matrix, o, dirs, target)
    st1 = init_state(noisy, opt, mesh)
    _, l1, _ = s_mesh(st1, cam.view_matrix, o, dirs, target)
    np.testing.assert_allclose(float(l1), float(l0), rtol=1e-4)


def test_fit_recovers_anisotropic_scales():
    """North-star generalization: gradient descent recovers a stretched
    per-axis scale from rendered targets."""
    import optax

    o, dirs = CAM.rays()
    target = an.render_rays_aniso_impl(o, dirs, SCENE, q_block=8,
                                       ray_block=64)
    noisy = SCENE.replace(scale=SCENE.scale * jnp.array([[1.4, 0.8, 1.1]]))
    opt = optax.adam(2e-2)
    opt_state = opt.init(noisy)

    @jax.jit
    def step(scene, opt_state):
        def f(s):
            c = an.render_rays_aniso_impl(o, dirs, s, q_block=8,
                                          ray_block=64)
            return jnp.mean((c - target) ** 2)

        loss, g = jax.value_and_grad(f)(scene)
        updates, opt_state = opt.update(g, opt_state, scene)
        return optax.apply_updates(scene, updates), opt_state, loss

    scene = noisy
    first = None
    for _ in range(60):
        scene, opt_state, loss = step(scene, opt_state)
        if first is None:
            first = float(loss)
    last = float(loss)
    assert last < first * 0.2, (first, last)
    err0 = float(jnp.mean(jnp.abs(noisy.scale - SCENE.scale)))
    err1 = float(jnp.mean(jnp.abs(scene.scale - SCENE.scale)))
    assert err1 < err0 * 0.7, (err0, err1)


def test_tiled_aniso_threads_approximations():
    """--erf/--exp must act on the tiled aniso path too (advisor round-4:
    they were silently dropped): a coarse approximation changes the image
    (vs exact) but stays within its known error band; and a tile_batch
    that does not divide the tile count must not crash (divisor guard)."""
    cam = Camera.create(position=(0.0, 0.0, -2.5), width=32, height=32)
    exact, ovf = an.render_tiled_aniso(SCENE, cam, tiles=4, capacity=8,
                                       q_block=8, tile_batch=7)
    approx, _ = an.render_tiled_aniso(SCENE, cam, tiles=4, capacity=8,
                                      q_block=8, erf_name="spline",
                                      exp_name="fast")
    assert int(ovf) == 0
    diff = float(np.abs(np.asarray(exact) - np.asarray(approx)).max())
    assert 0.0 < diff < 0.05   # changed, but within the approx error band


def test_aniso_saved_t_matches_recompute():
    """The saved-T aniso backward must match the recompute schedule to
    f32 rounding of the stored T (same contract as the isotropic and
    chunked kernels)."""
    from sgrt_tpu.ops.pallas_aniso import render_rays_pallas_aniso_impl

    o, dirs = CAM.rays()

    def grads(save_t):
        def f(s):
            from sgrt_tpu.ops.pallas_aniso import render_fused_aniso
            from sgrt_tpu.ops.anisotropic import pad_scene_aniso

            sp = pad_scene_aniso(s, 32)
            oc = sp.mu - o[None, :]
            invd = 1.0 / (sp.scale * sp.scale)
            r = dirs.shape[0]
            pad = (-r) % 128
            unit = jnp.zeros((pad, 3), dirs.dtype).at[:, 2].set(1.0)
            dp = jnp.concatenate([dirs, unit]) if pad else dirs
            counts = jnp.full((1,), s.n, jnp.int32)
            out = render_fused_aniso(
                oc[None], invd[None], sp.magnitude[None], sp.albedo[None],
                dp.T[None], counts, pb=8, qb=16, save_t=save_t,
                interpret=True)[0].T[:r]
            return jnp.sum(out ** 2)

        return jax.grad(f)(SCENE)

    g_re = grads(False)
    g_st = grads(True)
    for fld in ("mu", "scale", "magnitude", "albedo"):
        a = np.asarray(getattr(g_st, fld))
        b = np.asarray(getattr(g_re, fld))
        scale = max(np.abs(b).max(), 1e-8)
        # T stored to f32: one rounding per factor; aniso T spans wider
        # ranges than the isotropic case (per-ray sigma_bar)
        np.testing.assert_allclose(a / scale, b / scale, atol=2e-4,
                                   err_msg=fld)


def test_aniso_bucketed_step_matches_single():
    """Bucketed aniso train step vs the single-capacity step: same loss
    and same updated scene (SGD, one step)."""
    import optax

    from sgrt_tpu.ops.frame import orbit_camera
    from sgrt_tpu.ops.scheduler import BucketConfig
    from sgrt_tpu.parallel.fit import init_state, make_aniso_frame_train_step

    cam = orbit_camera(0.0, -2.5, 1.0, 32, 32)
    o, dirs = cam.rays()
    target = jnp.zeros((32, 32, 3))
    opt = optax.sgd(1e-2)
    common = dict(width=32, height=32, tiles=4, capacity=16)
    s_ref = make_aniso_frame_train_step(opt, **common)
    s_bkt = make_aniso_frame_train_step(opt, bucket_cfg=BucketConfig(4, 16, 8),
                                        **common)
    st1 = init_state(SCENE, opt)
    st2 = init_state(SCENE, opt)
    st1, l1, o1 = s_ref(st1, cam.view_matrix, o, dirs, target)
    st2, l2, o2 = s_bkt(st2, cam.view_matrix, o, dirs, target)
    assert int(o1) == 0 and int(o2) == 0
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
    for fld in ("mu", "scale", "magnitude", "albedo"):
        np.testing.assert_allclose(np.asarray(getattr(st2.scene, fld)),
                                   np.asarray(getattr(st1.scene, fld)),
                                   rtol=1e-5, atol=1e-7, err_msg=fld)


def test_tiled_aniso_respects_focal_length():
    """The tiled aniso culling must project with the CAMERA's focal length
    (round-5 review: it silently used 1.0, gathering wrong tile sets for
    any other focal): at focal 2 the tiled render must match the untiled
    fused renderer."""
    cam = Camera.create(position=(0.0, 0.0, -3.0), width=32, height=32,
                        focal_length=2.0)
    untiled = an.render_aniso(SCENE, cam, q_block=8, ray_block=256)
    tiled, ovf = an.render_tiled_aniso(SCENE, cam, tiles=4, capacity=8,
                                       q_block=8)
    assert int(ovf) == 0
    assert float(np.abs(np.asarray(tiled) - np.asarray(untiled)).max()) \
        < 1.0 / 255.0
