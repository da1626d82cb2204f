"""Multi-device (8 virtual CPU chips) sharding tests — rendering parity,
gradient psum equivalence, and loss descent for the fitting loop."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from sgrt_tpu.models.camera import Camera
from sgrt_tpu.models.gaussians import grid_scene, pad_scene
from sgrt_tpu.ops.render import render, render_rays
from sgrt_tpu.parallel.fit import fit, init_state, make_train_step
from sgrt_tpu.parallel.mesh import make_mesh, replicate, shard_rays
from sgrt_tpu.parallel.render import render_sharded


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, "conftest should fan out 8 CPU devices"
    return make_mesh()


SCENE = pad_scene(grid_scene(2), 8)
CAM = Camera.create(position=(0.0, 0.0, -4.0), width=8, height=16)


def test_sharded_render_matches_single(mesh):
    single = np.asarray(render(SCENE, CAM, q_block=8, ray_block=16))
    sharded = np.asarray(
        render_sharded(SCENE, CAM, mesh, q_block=8, ray_block=16)
    )
    np.testing.assert_allclose(sharded, single, rtol=1e-5, atol=1e-7)


def test_sharded_gradients_match_single(mesh):
    o, dirs = CAM.rays()
    target = jnp.zeros_like(dirs)
    opt = optax.sgd(0.0)

    step_single = make_train_step(opt, mesh=None, q_block=8, ray_block=16)
    step_sharded = make_train_step(opt, mesh=mesh, q_block=8, ray_block=16)

    s0 = init_state(SCENE, opt)
    _, loss_single = step_single(s0, o, dirs, target)

    dirs_s, target_s = shard_rays(mesh, dirs, target)
    scene_r = replicate(mesh, SCENE)
    s1 = init_state(scene_r, opt, mesh)
    _, loss_sharded = step_sharded(s1, o, dirs_s, target_s)

    # Per-shard mean + pmean reassociates the f32 reduction: tiny drift ok.
    np.testing.assert_allclose(float(loss_sharded), float(loss_single), rtol=1e-4)


def test_fit_reduces_loss(mesh):
    # Perturb the scene, fit back toward the rendered target.
    target_scene = SCENE
    o, dirs = CAM.rays()
    target = render_rays(o, dirs, target_scene, q_block=8, ray_block=16)

    noisy = target_scene.replace(
        mu=target_scene.mu + 0.05,
        magnitude=target_scene.magnitude * 0.7,
    )

    dirs_s, target_s = shard_rays(mesh, dirs, target)
    noisy_r = replicate(mesh, noisy)

    opt = optax.adam(2e-2)
    step = make_train_step(opt, mesh=mesh, q_block=8, ray_block=16)
    state = init_state(noisy_r, opt, mesh)
    first = None
    for _ in range(30):
        state, loss = step(state, o, dirs_s, target_s)
        if first is None:
            first = float(loss)
    last = float(loss)
    assert last < first * 0.5, (first, last)


def test_sharded_pallas_forward_matches_single(mesh):
    """The PRODUCTION (Pallas, tiled) forward under shard_map — tiles
    sharded over 8 devices — must match the single-device frame pipeline
    pixel-for-pixel (round-3 gap: the flagship kernel was sharded only
    inside the train step)."""
    from sgrt_tpu.models.gaussians import grid_scene
    from sgrt_tpu.ops.frame import orbit_camera, render_orbit_frame
    from sgrt_tpu.parallel.render import make_sharded_frame_renderer

    scene = grid_scene(3)
    single, ovf_s = render_orbit_frame(scene, 30.0, width=32, height=32,
                                       tiles=4, capacity=32,
                                       backend="pallas")
    cam = orbit_camera(30.0, -4.0, 1.0, 32, 32)
    o, dirs = cam.rays()
    renderer = make_sharded_frame_renderer(mesh, width=32, height=32,
                                           tiles=4, capacity=32)
    sharded, ovf = renderer(replicate(mesh, scene), cam.view_matrix, o, dirs)
    assert int(ovf) == int(ovf_s) == 0
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(single),
                               rtol=1e-4, atol=5e-5)


def test_sharded_pallas_forward_bucketed_matches_single(mesh):
    """Same parity with the bucketed scheduler: both bucket tile axes
    sharded with the round-robin interleave."""
    from sgrt_tpu.models.gaussians import grid_scene
    from sgrt_tpu.ops.frame import orbit_camera
    from sgrt_tpu.ops.render import _tile_rays, _untile_image
    from sgrt_tpu.ops.scheduler import BucketConfig, render_tiles_bucketed
    from sgrt_tpu.parallel.render import make_sharded_frame_renderer

    scene = grid_scene(3)
    cfg = BucketConfig(n_dense=8, cap_dense=32, cap_sparse=16)
    cam = orbit_camera(30.0, -4.0, 1.0, 32, 32)
    o, dirs = cam.rays()
    d = _tile_rays(dirs, 32, 32, 4)
    colors, _, ovf_s = render_tiles_bucketed(scene, cam.view_matrix, o, d,
                                             cfg, tiles=4)
    single = _untile_image(colors, 32, 32, 4)
    renderer = make_sharded_frame_renderer(mesh, width=32, height=32,
                                           tiles=4, bucket_cfg=cfg)
    sharded, ovf = renderer(replicate(mesh, scene), cam.view_matrix, o, dirs)
    assert int(ovf) == int(ovf_s) == 0
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(single),
                               rtol=1e-4, atol=5e-5)


def test_mesh_step_compiles_once(mesh):
    """Feeding a mesh step's output state back in must NOT recompile: the
    output scene carries NamedSharding(mesh, P()), so init_state must place
    the initial state identically (a sharding flip-flop silently doubled
    compile time and poisoned every timed loop — found on the TPU where the
    hidden second compile cost ~30 s/step)."""
    o, dirs = CAM.rays()
    target = jnp.zeros_like(dirs)
    opt = optax.adam(1e-2)
    step = make_train_step(opt, mesh=mesh, q_block=8, ray_block=16)
    dirs_s, target_s = shard_rays(mesh, dirs, target)
    state = init_state(SCENE, opt, mesh)
    for _ in range(3):
        state, _ = step(state, o, dirs_s, target_s)
    assert step._cache_size() == 1, (
        f"mesh train step compiled {step._cache_size()} times; input/output "
        "state shardings disagree")


def test_fit_api_single_device():
    o, dirs = CAM.rays()
    target = render_rays(o, dirs, SCENE, q_block=8, ray_block=16)
    noisy = SCENE.replace(magnitude=SCENE.magnitude * 0.5)
    fitted, losses = fit(
        noisy, o, dirs, target, steps=20, learning_rate=3e-2,
        q_block=8, ray_block=16,
    )
    assert losses[-1] < losses[0]
    for leaf in jax.tree_util.tree_leaves(fitted):
        assert np.all(np.isfinite(np.asarray(leaf)))
