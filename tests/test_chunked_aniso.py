"""Chunked ANISOTROPIC kernel (ops.pallas_chunked_aniso) vs the XLA aniso
oracle — the diagonal-covariance twin of tests/test_chunked.py, closing
the last capacity cliff (dense aniso scenes above the monolithic aniso
ceiling previously hard-errored)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sgrt_tpu.models.camera import Camera
from sgrt_tpu.ops.anisotropic import (AnisoScene, pad_scene_aniso,
                                      render_rays_aniso_impl)
from sgrt_tpu.ops.pallas_chunked_aniso import (render_fused_chunked_aniso,
                                               tile_renderer_aniso_for)


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(3)
    n_live = 200
    scene = AnisoScene(
        mu=jnp.asarray(rng.uniform(-1, 1, (n_live, 3)), jnp.float32),
        scale=jnp.asarray(rng.uniform(0.1, 0.5, (n_live, 3)), jnp.float32),
        magnitude=jnp.asarray(rng.uniform(0.5, 2.0, (n_live,)), jnp.float32),
        albedo=jnp.asarray(rng.uniform(0, 1, (n_live, 3)), jnp.float32))
    cam = Camera.create(position=(0.0, 0.0, -4.0), width=32, height=8)
    o, dirs = cam.rays()                           # R=256, 2 ray blocks
    sp = pad_scene_aniso(scene, 384)               # 3 chunks of 128
    return scene, sp, o, dirs


def _chunked(o, mu, scale, mag, alb, dirs, counts):
    oc = mu - o[None, :]
    invd = 1.0 / (scale * scale)
    return render_fused_chunked_aniso(
        oc[None], invd[None], mag[None], alb[None], dirs.T[None], counts,
        ck=128, pb=8, qb=16, interpret=True)[0].T


def test_chunked_aniso_forward_matches_xla(setup):
    scene, sp, o, dirs = setup
    counts = jnp.array([scene.n], jnp.int32)
    out = _chunked(o, sp.mu, sp.scale, sp.magnitude, sp.albedo, dirs, counts)
    ref = render_rays_aniso_impl(o, dirs, scene, q_block=8, ray_block=256)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_chunked_aniso_gradients_match_xla(setup):
    scene, sp, o, dirs = setup
    counts = jnp.array([scene.n], jnp.int32)

    def loss_c(mu, scale, mag, alb, d):
        return jnp.sum(_chunked(o, mu, scale, mag, alb, d, counts) ** 2)

    def loss_r(s, d):
        return jnp.sum(render_rays_aniso_impl(o, d, s, q_block=8,
                                              ray_block=256) ** 2)

    gc = jax.grad(loss_c, argnums=(0, 1, 2, 3, 4))(
        sp.mu, sp.scale, sp.magnitude, sp.albedo, dirs)
    gr, gd = jax.grad(loss_r, argnums=(0, 1))(scene, dirs)
    refs = [gr.mu, gr.scale, gr.magnitude, gr.albedo, gd]
    for nm, a, b in zip(("mu", "scale", "magnitude", "albedo", "dirs"),
                        gc, refs):
        a, b = np.asarray(a), np.asarray(b)
        if nm != "dirs":
            assert np.all(a[scene.n:] == 0), f"{nm}: padding grads nonzero"
            a = a[: scene.n]
        sc = max(np.abs(b).max(), 1e-8)
        # scale grads chain through invd = scale^-2 (extra conditioning)
        np.testing.assert_allclose(a / sc, b / sc, atol=5e-4, err_msg=nm)


def test_aniso_renderer_routing():
    """tile_renderer_aniso_for routes to the chunked kernel above the
    monolithic aniso ceiling and the results of both routes agree on data
    that fits both."""
    from sgrt_tpu.ops.pallas_aniso import MAX_BWD_CAPACITY_ANISO

    cap_lo, render_lo = tile_renderer_aniso_for(128)
    cap_hi, render_hi = tile_renderer_aniso_for(MAX_BWD_CAPACITY_ANISO + 1)
    assert cap_hi % 128 == 0 and cap_hi > MAX_BWD_CAPACITY_ANISO

    rng = np.random.default_rng(0)
    t2, k = 2, 128
    tiled = AnisoScene(
        mu=jnp.asarray(rng.uniform(-1, 1, (t2, k, 3)), jnp.float32),
        scale=jnp.asarray(rng.uniform(0.1, 0.4, (t2, k, 3)), jnp.float32),
        magnitude=jnp.asarray(rng.uniform(0.5, 1.5, (t2, k)), jnp.float32),
        albedo=jnp.asarray(rng.uniform(0, 1, (t2, k, 3)), jnp.float32))
    # pad tiles to the chunked capacity with inert rows
    def pad_to(a, n, fill):
        padshape = (t2, n - k) + a.shape[2:]
        return jnp.concatenate([a, jnp.full(padshape, fill, a.dtype)], 1)
    tiled_hi = AnisoScene(mu=pad_to(tiled.mu, cap_hi, 0.0),
                          scale=pad_to(tiled.scale, cap_hi, 1.0),
                          magnitude=pad_to(tiled.magnitude, cap_hi, 0.0),
                          albedo=pad_to(tiled.albedo, cap_hi, 0.0))
    o = jnp.zeros((3,)).at[2].set(-4.0)
    d = jnp.asarray(rng.normal(size=(t2, 128, 3)), jnp.float32)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    counts = jnp.array([k, 50], jnp.int32)
    lo = render_lo(tiled, o, d, counts)
    hi = render_hi(tiled_hi, o, d, counts)
    np.testing.assert_allclose(np.asarray(hi), np.asarray(lo),
                               rtol=1e-5, atol=1e-6)


def test_aniso_step_routes_to_chunked_above_wall():
    """make_aniso_frame_train_step above the monolithic aniso ceiling must
    build (old behavior: ValueError) and descend."""
    import optax

    from sgrt_tpu.models.gaussians import grid_scene
    from sgrt_tpu.ops import anisotropic as an
    from sgrt_tpu.ops.frame import orbit_camera
    from sgrt_tpu.ops.pallas_aniso import MAX_BWD_CAPACITY_ANISO
    from sgrt_tpu.parallel.fit import (init_state,
                                       make_aniso_frame_train_step)

    scene = an.from_isotropic(grid_scene(3, sigma=0.3, magnitude=2.0))
    scene = scene.replace(scale=scene.scale * jnp.asarray([[1.4, 0.8, 1.0]]))
    cam = orbit_camera(0.0, -4.0, 1.0, 16, 16)
    o, dirs = cam.rays()
    target = jnp.zeros((16, 16, 3))
    opt = optax.adam(1e-2)
    step = make_aniso_frame_train_step(
        opt, width=16, height=16, tiles=2,
        capacity=MAX_BWD_CAPACITY_ANISO + 1)
    state = init_state(scene, opt)
    state, loss0, ovf = step(state, cam.view_matrix, o, dirs, target)
    assert int(ovf) == 0
    for _ in range(3):
        state, loss, ovf = step(state, cam.view_matrix, o, dirs, target)
    assert float(loss) < float(loss0)


def test_aniso_slab_step_matches_single():
    """The aniso=True slab step (host-bounded programs, exact gradient
    accumulation) matches the monolithic aniso step under SGD."""
    import optax

    from sgrt_tpu.models.gaussians import grid_scene
    from sgrt_tpu.ops import anisotropic as an
    from sgrt_tpu.ops.frame import orbit_camera
    from sgrt_tpu.parallel.fit import (init_state,
                                       make_aniso_frame_train_step,
                                       make_slab_frame_train_step)

    scene = an.from_isotropic(grid_scene(4, sigma=0.3, magnitude=2.0))
    scene = scene.replace(scale=scene.scale * jnp.asarray([[1.4, 0.8, 1.0]]))
    cam = orbit_camera(0.0, -4.0, 1.0, 32, 32)
    o, dirs = cam.rays()
    target = jnp.zeros((32, 32, 3))
    opt = optax.sgd(1e-2)
    common = dict(width=32, height=32, tiles=4, capacity=16)
    s_ref = make_aniso_frame_train_step(opt, **common)
    s_slab = make_slab_frame_train_step(opt, slab_tiles=4, aniso=True,
                                        **common)
    st1 = init_state(scene, opt)
    st2 = init_state(scene, opt)
    st1, l1, o1 = s_ref(st1, cam.view_matrix, o, dirs, target)
    st2, l2, o2 = s_slab(st2, cam.view_matrix, o, dirs, target)
    assert int(o1) == 0 and int(o2) == 0
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
    for fld in ("mu", "scale", "magnitude", "albedo"):
        np.testing.assert_allclose(np.asarray(getattr(st2.scene, fld)),
                                   np.asarray(getattr(st1.scene, fld)),
                                   rtol=1e-5, atol=1e-7, err_msg=fld)
