"""Checkpoint/resume (orbax) — NEW capability vs the reference (SURVEY §5:
"Checkpoint/resume: none"). Save mid-fit, restore into a fresh state, and
verify the resumed trajectory matches an uninterrupted run."""

import jax.numpy as jnp
import numpy as np
import optax

from sgrt_tpu.models.camera import Camera
from sgrt_tpu.models.gaussians import grid_scene
from sgrt_tpu.ops.render import render_rays_impl
from sgrt_tpu.parallel.fit import FitState, init_state, make_train_step
from sgrt_tpu.utils.checkpoint import make_manager, restore_fit, save_fit


def _setup():
    scene = grid_scene(4)
    cam = Camera.create(position=(0.0, 0.0, -4.0), width=16, height=16)
    o, dirs = cam.rays()
    target = render_rays_impl(o, dirs, scene, q_block=16, ray_block=256)
    noisy = scene.replace(mu=scene.mu + 0.04)
    return noisy, o, dirs, target


def test_checkpoint_roundtrip_resumes_exactly(tmp_path):
    noisy, o, dirs, target = _setup()
    opt = optax.adam(3e-3)
    step = make_train_step(opt, q_block=16, ray_block=256)

    # uninterrupted: 6 steps
    st = init_state(noisy, opt)
    losses = []
    for _ in range(6):
        st, l = step(st, o, dirs, target)
        losses.append(float(l))

    # interrupted: 3 steps, save, restore, 3 more
    st2 = init_state(noisy, opt)
    for _ in range(3):
        st2, l = step(st2, o, dirs, target)
    mgr = make_manager(str(tmp_path / "ckpt"))
    save_fit(mgr, int(st2.step), st2)
    mgr.wait_until_finished()

    template = init_state(noisy, opt)
    restored = restore_fit(str(tmp_path / "ckpt"), template)
    assert restored is not None
    assert int(restored.step) == 3
    np.testing.assert_allclose(
        np.asarray(restored.scene.mu), np.asarray(st2.scene.mu)
    )

    st3 = FitState(restored.scene, restored.opt_state,
                   jnp.asarray(restored.step))
    resumed = []
    for _ in range(3):
        st3, l = step(st3, o, dirs, target)
        resumed.append(float(l))
    np.testing.assert_allclose(resumed, losses[3:], rtol=1e-5)


def test_restore_missing_returns_none(tmp_path):
    noisy, *_ = _setup()
    opt = optax.adam(1e-3)
    template = init_state(noisy, opt)
    # orbax requires the directory to exist; make_manager creates it
    make_manager(str(tmp_path / "empty"))
    assert restore_fit(str(tmp_path / "empty"), template) is None
