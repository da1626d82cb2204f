"""Whole-frame tiled training step (the north-star fwd+bwd configuration):
tile/cull → gather → fused kernel fwd + custom-VJP bwd → gather-transpose
scatter → optimizer; single-device vs tile-sharded 8-device mesh parity."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from sgrt_tpu.models.gaussians import grid_scene
from sgrt_tpu.ops.frame import orbit_camera, render_orbit_frame
from sgrt_tpu.parallel.fit import init_state, make_frame_train_step
from sgrt_tpu.parallel.mesh import make_mesh


def _setup():
    scene = grid_scene(4)
    cam = orbit_camera(0.0, -4.0, 1.0, 32, 32)
    o, dirs = cam.rays()
    target, _ = render_orbit_frame(scene, 0.0, width=32, height=32, tiles=4,
                                   capacity=32)
    return cam, o, dirs, target


def _noisy():
    s = grid_scene(4)
    return s.replace(mu=s.mu + 0.03)


def _run(step, cam, o, dirs, target, n=4):
    st = init_state(_noisy(), optax.adam(3e-3))
    losses = []
    for _ in range(n):
        st, l, overflow = step(st, cam.view_matrix, o, dirs, target)
        assert int(overflow) == 0
        losses.append(float(l))
    return losses


def test_frame_step_converges_single_device():
    cam, o, dirs, target = _setup()
    opt = optax.adam(3e-3)
    step = make_frame_train_step(opt, width=32, height=32, tiles=4, capacity=32)
    losses = _run(step, cam, o, dirs, target)
    assert losses[-1] < losses[0]


def test_frame_step_sharded_matches_single():
    cam, o, dirs, target = _setup()
    opt = optax.adam(3e-3)
    single = make_frame_train_step(opt, width=32, height=32, tiles=4, capacity=32)
    mesh = make_mesh()
    sharded = make_frame_train_step(opt, width=32, height=32, tiles=4,
                                    capacity=32, mesh=mesh)
    ls = _run(single, cam, o, dirs, target)
    lm = _run(sharded, cam, o, dirs, target)
    np.testing.assert_allclose(lm, ls, rtol=1e-3)


def test_frame_step_sharded_bucketed_matches_single():
    """Mesh + bucketed scheduler (round-robin tile interleave over devices)
    must reproduce the single-device bucketed step's losses."""
    from sgrt_tpu.ops.frame import probe_buckets

    cam, o, dirs, target = _setup()
    scene = _noisy()
    mesh = make_mesh()
    n_dev = mesh.devices.size
    cfg = probe_buckets(scene, [0.0], -4.0, 1.0, 4, multiple_of=n_dev)
    if cfg.n_dense == 0:   # force a real two-bucket split for the test
        from sgrt_tpu.ops.scheduler import BucketConfig

        cfg = BucketConfig(n_dev, cfg.cap_dense, cfg.cap_dense)
    opt = optax.adam(3e-3)
    single = make_frame_train_step(opt, width=32, height=32, tiles=4,
                                   capacity=32, bucket_cfg=cfg)
    sharded = make_frame_train_step(opt, width=32, height=32, tiles=4,
                                    capacity=32, mesh=mesh, bucket_cfg=cfg)
    ls = _run(single, cam, o, dirs, target)
    lm = _run(sharded, cam, o, dirs, target)
    np.testing.assert_allclose(lm, ls, rtol=1e-3)


def test_frame_step_xla_backend_matches_pallas():
    cam, o, dirs, target = _setup()
    opt = optax.adam(3e-3)
    p = make_frame_train_step(opt, width=32, height=32, tiles=4, capacity=32,
                              backend="pallas")
    x = make_frame_train_step(opt, width=32, height=32, tiles=4, capacity=32,
                              backend="xla")
    lp = _run(p, cam, o, dirs, target, n=3)
    lx = _run(x, cam, o, dirs, target, n=3)
    np.testing.assert_allclose(lp, lx, rtol=1e-3)


def test_frame_step_flags_capacity_overflow():
    """Under-provisioned capacity must be reported, not silently truncated
    (VERDICT r1: the reference never truncates — per-tile std::vector,
    rt.cpp:64). 64 co-located Gaussians >> capacity 32 → overflow > 0."""
    from sgrt_tpu.models.gaussians import GaussianScene

    n = 64
    rng = np.random.default_rng(0)
    clustered = GaussianScene(
        mu=jnp.asarray(rng.normal(0, 0.05, (n, 3)), jnp.float32),
        sigma=jnp.full((n,), 0.1, jnp.float32),
        magnitude=jnp.ones((n,), jnp.float32),
        albedo=jnp.full((n, 3), 0.5, jnp.float32),
    )
    cam = orbit_camera(0.0, -4.0, 1.0, 32, 32)
    o, dirs = cam.rays()
    target = jnp.zeros((32, 32, 3), jnp.float32)
    opt = optax.adam(3e-3)
    # capacity 8 rounds up to one 32-wide block — still < 64 members
    step = make_frame_train_step(opt, width=32, height=32, tiles=4, capacity=8)
    st = init_state(clustered, opt)
    st, _, overflow = step(st, cam.view_matrix, o, dirs, target)
    assert int(overflow) > 0


def test_frame_step_trainable_mask():
    cam, o, dirs, target = _setup()
    opt = optax.adam(3e-3)
    step = make_frame_train_step(opt, width=32, height=32, tiles=4,
                                 capacity=32, trainable=("mu",))
    st = init_state(_noisy(), optax.adam(3e-3))
    # snapshot to host before the step donates the state buffers
    mu0 = np.asarray(st.scene.mu).copy()
    sig0 = np.asarray(st.scene.sigma).copy()
    alb0 = np.asarray(st.scene.albedo).copy()
    st, _, _ = step(st, cam.view_matrix, o, dirs, target)
    assert not np.allclose(np.asarray(st.scene.mu), mu0)
    np.testing.assert_array_equal(np.asarray(st.scene.sigma), sig0)
    np.testing.assert_array_equal(np.asarray(st.scene.albedo), alb0)


def test_camera_angle_recovery():
    """Recover a perturbed orbit angle by gradient descent through the
    renderer — exercises the ray-direction gradients of the fused kernel's
    custom VJP (ddirs = oc^T @ dmb), a capability the forward-only
    reference cannot express."""
    import optax

    from sgrt_tpu.models.gaussians import grid_scene
    from sgrt_tpu.ops.frame import orbit_camera
    from sgrt_tpu.ops.pallas_kernel import render_rays_pallas_impl

    scene = grid_scene(3)
    true_angle = 20.0

    def render_at(angle):
        cam = orbit_camera(angle, -4.0, 1.0, 24, 24)
        o, dirs = cam.rays()
        return render_rays_pallas_impl(o, dirs, scene)

    target = jax.lax.stop_gradient(render_at(true_angle))

    @jax.jit
    def loss_fn(angle):
        return jnp.mean((render_at(angle) - target) ** 2)

    angle = jnp.asarray(24.0)           # 4 degrees off
    opt = optax.adam(0.5)
    opt_state = opt.init(angle)
    g = jax.jit(jax.grad(loss_fn))
    for _ in range(60):
        upd, opt_state = opt.update(g(angle), opt_state, angle)
        angle = optax.apply_updates(angle, upd)
    err = abs(float(angle) - true_angle)
    assert err < 0.5, f"angle recovered to {float(angle)} (err {err})"


def test_render_orbit_frames_matches_per_frame():
    """The pipelined-dispatch orbit renderer (bench/GIF path: frames
    dispatched without host syncs, stacked once at the end) must reproduce
    render_orbit_frame exactly, frame by frame."""
    from sgrt_tpu.models.gaussians import grid_scene
    from sgrt_tpu.ops.frame import render_orbit_frame, render_orbit_frames

    scene = grid_scene(3)
    angles = [0.0, 17.0, 33.0, 51.0, 72.0]
    imgs, ovf = render_orbit_frames(scene, angles, width=32, height=32,
                                    tiles=4, capacity=32)
    assert imgs.shape == (5, 32, 32, 3)
    assert int(ovf) == 0
    for i, a in enumerate(angles):
        ref, _ = render_orbit_frame(scene, a, width=32, height=32, tiles=4,
                                    capacity=32)
        np.testing.assert_allclose(np.asarray(imgs[i]), np.asarray(ref),
                                   rtol=1e-6, atol=1e-7)


def test_batched_orbit_matches_per_frame():
    """render_orbit_frames_batched (cross-frame tile batching, plain and
    bucketed, incl. a trailing partial batch) must be pixel-identical to
    the per-frame loop."""
    import numpy as np

    from sgrt_tpu.models.gaussians import grid_scene
    from sgrt_tpu.ops.frame import (render_orbit_frame,
                                    render_orbit_frames_batched)
    from sgrt_tpu.ops.scheduler import BucketConfig

    scene = grid_scene(4, sigma=0.3, magnitude=2.0)
    angles = [0.0, 25.0, 50.0, 75.0, 100.0]   # 5 frames, batch 3 → partial
    cfg = dict(width=32, height=32, tiles=4, capacity=16)

    ref = [np.asarray(render_orbit_frame(scene, a, -4.0, 1.0,
                                         backend="pallas", **cfg)[0])
           for a in angles]
    b_plain, ovf = render_orbit_frames_batched(scene, angles, -4.0, 1.0,
                                               batch_frames=3, **cfg)
    assert int(ovf) == 0
    for i in range(len(angles)):
        np.testing.assert_array_equal(np.asarray(b_plain[i]), ref[i])

    bc = BucketConfig(4, 16, 8)
    ref_b = [np.asarray(render_orbit_frame(scene, a, -4.0, 1.0,
                                           backend="pallas", bucket_cfg=bc,
                                           **cfg)[0]) for a in angles]
    b_bkt, ovf_b = render_orbit_frames_batched(scene, angles, -4.0, 1.0,
                                               batch_frames=3, bucket_cfg=bc,
                                               **cfg)
    assert int(ovf_b) == 0
    for i in range(len(angles)):
        np.testing.assert_array_equal(np.asarray(b_bkt[i]), ref_b[i])
