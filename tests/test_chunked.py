"""Gaussian-axis chunked kernel (ops.pallas_chunked) vs the XLA oracle.

The chunked kernel must be bit-compatible (to f32 accumulation order) with
the monolithic formulation on scenes that FIT the monolithic kernel, and
must be the only path that runs above pallas_kernel.MAX_BWD_CAPACITY —
the dense-scene capacity wall (docs/LARGE_N.md, reference contract:
per-tile std::vector never truncates, src/vrt/rt.cpp:64).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sgrt_tpu.models.camera import Camera
from sgrt_tpu.models.gaussians import GaussianScene, grid_scene, pad_scene
from sgrt_tpu.ops.pallas_chunked import (
    chunk_plan,
    render_fused_chunked,
    render_tiles_chunked,
)
from sgrt_tpu.ops.render import render_rays_impl


@pytest.fixture(scope="module")
def setup():
    base = grid_scene(16, sigma=0.25, magnitude=3.0)  # N=256 live
    cam = Camera.create(position=(0.0, 0.0, -4.0), width=32, height=8)
    o, dirs = cam.rays()                             # R=256, 2 ray blocks
    sp = pad_scene(base, 384)                        # 3 chunks of 128
    oc = sp.mu - o[None, :]
    return base, sp, o, dirs, oc


def _chunked(oc, sig, mag, alb, dirs, counts, **kw):
    kw.setdefault("ck", 128)
    kw.setdefault("pb", 8)
    kw.setdefault("qb", 16)
    kw.setdefault("interpret", True)
    return render_fused_chunked(oc[None], sig[None], mag[None], alb[None],
                                dirs.T[None], counts, **kw)[0].T


def test_chunked_forward_matches_xla(setup):
    base, sp, o, dirs, oc = setup
    counts = jnp.array([base.n], jnp.int32)
    out = _chunked(oc, sp.sigma, sp.magnitude, sp.albedo, dirs, counts)
    ref = render_rays_impl(o, dirs, base, q_block=128, ray_block=256)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_chunked_gradients_match_xla(setup):
    base, sp, o, dirs, oc = setup
    counts = jnp.array([base.n], jnp.int32)

    def loss_c(oc, sig, mag, alb, d):
        return jnp.sum(_chunked(oc, sig, mag, alb, d, counts) ** 2)

    def loss_r(s, d):
        return jnp.sum(render_rays_impl(o, d, s, q_block=32,
                                        ray_block=256) ** 2)

    gc = jax.grad(loss_c, argnums=(0, 1, 2, 3, 4))(
        oc, sp.sigma, sp.magnitude, sp.albedo, dirs)
    gr, gd = jax.grad(loss_r, argnums=(0, 1))(base, dirs)
    refs = [gr.mu, gr.sigma, gr.magnitude, gr.albedo, gd]
    for nm, a, b in zip(("mu", "sigma", "magnitude", "albedo", "dirs"),
                        gc, refs):
        a, b = np.asarray(a), np.asarray(b)
        if nm != "dirs":
            assert np.all(a[base.n:] == 0), f"{nm}: padding grads nonzero"
            a = a[: base.n]
        scale = max(np.abs(b).max(), 1e-8)
        np.testing.assert_allclose(a / scale, b / scale, atol=5e-5,
                                   err_msg=nm)


def test_chunked_batch_counts_and_dead_chunks(setup):
    """Per-tile counts bound work per chunk; fully dead tiles/chunks emit
    zero colors and zero gradients."""
    base, sp, o, dirs, oc = setup
    inert = GaussianScene(mu=jnp.zeros((384, 3)), sigma=jnp.ones((384,)),
                          magnitude=jnp.zeros((384,)),
                          albedo=jnp.zeros((384, 3)))
    short = pad_scene(
        GaussianScene(mu=base.mu[:20], sigma=base.sigma[:20],
                      magnitude=base.magnitude[:20], albedo=base.albedo[:20]),
        384)
    counts = jnp.array([256, 20, 0], jnp.int32)
    mu = jnp.stack([sp.mu, short.mu, inert.mu])
    sig = jnp.stack([sp.sigma, short.sigma, inert.sigma])
    mag = jnp.stack([sp.magnitude, short.magnitude, inert.magnitude])
    alb = jnp.stack([sp.albedo, short.albedo, inert.albedo])
    ocb = mu - o[None, None, :]
    dirs_t = jnp.tile(dirs.T[None], (3, 1, 1))

    def f(ocb, sig, mag, alb, dirs_t):
        return render_fused_chunked(ocb, sig, mag, alb, dirs_t, counts,
                                    ck=128, pb=8, qb=16, interpret=True)

    out = f(ocb, sig, mag, alb, dirs_t)
    ref0 = render_rays_impl(o, dirs, base, q_block=128, ray_block=256).T
    short20 = GaussianScene(mu=base.mu[:20], sigma=base.sigma[:20],
                            magnitude=base.magnitude[:20],
                            albedo=base.albedo[:20])
    ref1 = render_rays_impl(o, dirs, short20, q_block=4, ray_block=256).T
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(ref0),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(out[1]), np.asarray(ref1),
                               atol=2e-5)
    assert bool(jnp.all(out[2] == 0))

    g = jax.grad(lambda *a: jnp.sum(f(*a) ** 2), argnums=(0, 1, 2, 3, 4))(
        ocb, sig, mag, alb, dirs_t)
    assert all(bool(jnp.all(gi[2] == 0)) for gi in g)


def test_chunk_plan():
    """chunk_plan: padded capacity is a C-multiple of a block-aligned ck,
    always >= the request, and single-chunk below DEFAULT_CHUNK."""
    for cap in (100, 2048, 2049, 4097, 5000, 12000):
        padded, ck = chunk_plan(cap)
        assert padded >= cap
        assert padded % ck == 0
        assert ck % 8 == 0
    padded, ck = chunk_plan(100)
    assert padded // ck == 1
    padded, ck = chunk_plan(5000)
    assert padded // ck == 3


def test_render_tiles_chunked_matches_monolithic(setup):
    """Tile-batched chunked wrapper vs render_tiles_pallas on data that
    fits both."""
    from sgrt_tpu.ops.pallas_kernel import render_tiles_pallas

    base, sp, o, dirs, oc = setup
    t2 = 4
    tiled = jax.tree_util.tree_map(
        lambda a: jnp.tile(a[None], (t2,) + (1,) * a.ndim), sp)
    d = jnp.tile(dirs[None, :64], (t2, 1, 1))
    counts = jnp.array([256, 256, 32, 0], jnp.int32)
    ch = render_tiles_chunked(tiled, o, d, counts, ck=128, pb=8, qb=16,
                              interpret=True)
    mono = render_tiles_pallas(tiled, o, d, counts, pb=8, qb=16,
                               interpret=True)
    np.testing.assert_allclose(np.asarray(ch), np.asarray(mono), atol=2e-5)


def test_train_step_routes_to_chunked_above_wall():
    """make_frame_train_step with capacity above MAX_BWD_CAPACITY must
    build (old behavior: ValueError) and descend — the capacity wall is
    now the far higher MAX_CHUNKED_CAPACITY."""
    import optax

    from sgrt_tpu.ops.frame import orbit_camera
    from sgrt_tpu.parallel.fit import (init_state, make_frame_train_step)
    from sgrt_tpu.ops.pallas_kernel import MAX_BWD_CAPACITY

    scene = grid_scene(4, sigma=0.3, magnitude=2.0)
    cam = orbit_camera(0.0, -4.0, 1.0, 16, 16)
    o, dirs = cam.rays()
    target = jnp.zeros((16, 16, 3))
    opt = optax.adam(1e-2)
    step = make_frame_train_step(
        opt, width=16, height=16, tiles=2, capacity=MAX_BWD_CAPACITY + 1,
        backend="pallas")
    state = init_state(scene, opt)
    state, loss0, ovf = step(state, cam.view_matrix, o, dirs, target)
    assert int(ovf) == 0
    for _ in range(3):
        state, loss, ovf = step(state, cam.view_matrix, o, dirs, target)
    assert float(loss) < float(loss0)


def test_capacity_beyond_chunked_ceiling_raises():
    from sgrt_tpu.ops.pallas_chunked import MAX_CHUNKED_CAPACITY
    from sgrt_tpu.parallel.fit import _check_bwd_capacity

    with pytest.raises(ValueError, match="chunked"):
        _check_bwd_capacity(MAX_CHUNKED_CAPACITY + 1, None, "pallas")
    _check_bwd_capacity(MAX_CHUNKED_CAPACITY, None, "pallas")  # no raise


def test_chunked_saved_t_matches_recompute(setup):
    """The saved-T backward schedule must produce identical gradients to
    the recompute schedule (same math, different residuals)."""
    base, sp, o, dirs, oc = setup
    counts = jnp.array([base.n], jnp.int32)

    def loss(save_t):
        def f(oc, sig, mag, alb, d):
            return jnp.sum(_chunked(oc, sig, mag, alb, d, counts,
                                    save_t=save_t) ** 2)
        return jax.grad(f, argnums=(0, 1, 2, 3, 4))(
            oc, sp.sigma, sp.magnitude, sp.albedo, dirs)

    g_re = loss(False)
    g_st = loss(True)
    # T is stored to f32 in HBM, so the schedules differ by one rounding
    # of each factor — compare scale-relative, as the monolithic
    # saved-T test does
    for nm, a, b in zip(("mu", "sigma", "magnitude", "albedo", "dirs"),
                        g_st, g_re):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(b).max(), 1e-8)
        np.testing.assert_allclose(a / scale, b / scale, atol=5e-5,
                                   err_msg=nm)


def test_slab_step_sharded_matches_single():
    """Mesh-sharded slab step (per-slab tile shards + psum) vs the
    single-device slab step: same loss and updated scene under SGD."""
    import optax

    from sgrt_tpu.ops.frame import orbit_camera, render_orbit_frame
    from sgrt_tpu.parallel.fit import init_state, make_slab_frame_train_step
    from sgrt_tpu.parallel.mesh import make_mesh

    scene = grid_scene(4, sigma=0.3, magnitude=2.0)
    cam = orbit_camera(0.0, -4.0, 1.0, 32, 32)
    o, dirs = cam.rays()
    target, _ = render_orbit_frame(grid_scene(4, sigma=0.35), 0.0, -4.0, 1.0,
                                   width=32, height=32, tiles=4, capacity=16,
                                   backend="pallas")
    opt = optax.sgd(1e-2)
    common = dict(width=32, height=32, tiles=4, capacity=16, slab_tiles=8)
    s_one = make_slab_frame_train_step(opt, **common)
    mesh = make_mesh(jax.devices()[:4])
    s_mesh = make_slab_frame_train_step(opt, mesh=mesh, **common)
    st1 = init_state(scene, opt)
    st2 = init_state(scene, opt, mesh)
    st1, l1, o1 = s_one(st1, cam.view_matrix, o, dirs, target)
    st2, l2, o2 = s_mesh(st2, cam.view_matrix, o, dirs, target)
    assert int(o1) == 0 and int(o2) == 0
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
    for fld in ("mu", "sigma", "magnitude", "albedo"):
        np.testing.assert_allclose(np.asarray(getattr(st2.scene, fld)),
                                   np.asarray(getattr(st1.scene, fld)),
                                   rtol=1e-5, atol=1e-7, err_msg=fld)
