"""Tiling/culling gather-compaction vs a literal numpy transcription of the
reference's tile_gaussians (src/vrt/rt.cpp:29-69), plus end-to-end tiled
render parity."""

import jax.numpy as jnp
import numpy as np
import pytest

from sgrt_tpu.models.camera import Camera
from sgrt_tpu.models.gaussians import grid_scene, make_scene
from sgrt_tpu.ops.render import render, render_tiled
from sgrt_tpu.ops.tiling import (
    gather_tiles,
    max_tile_count,
    tile_centers,
    tile_indices,
    tile_membership,
)


def _reference_membership(scene, view, tiles):
    """Direct numpy transcription of rt.cpp:29-69 semantics."""
    mu = np.asarray(scene.mu)
    sigma = np.asarray(scene.sigma)
    v = np.asarray(view)
    n = mu.shape[0]
    t2 = tiles * tiles
    member = np.zeros((t2, n), bool)
    tw = 2.0 / tiles
    proj = (v[:3, :3] @ mu.T).T + v[:3, 3]
    ty_centers = -1.0 + tw / 2 + tw * np.arange(tiles)
    for a, y in enumerate(ty_centers):
        for b, x in enumerate(ty_centers):
            t = a * tiles + b
            for i in range(n):
                if proj[i, 2] < 1.0:
                    continue
                m2 = proj[i, :2] / proj[i, 2]
                sp = sigma[i] / proj[i, 2]
                if sp < 1e-5:
                    continue
                p = np.abs(np.array([x, y]) - m2)
                if p[0] <= abs(x) + tw / 2 + 3.3 * sp and p[1] <= abs(y) + tw / 2 + 3.3 * sp:
                    member[t, i] = True
    return member


@pytest.fixture
def random_scene():
    rng = np.random.default_rng(7)
    n = 40
    return make_scene(
        mu=rng.uniform(-2, 2, (n, 3)) + np.array([0, 0, 2.5]),
        sigma=rng.uniform(0.05, 0.4, n),
        magnitude=rng.uniform(0.2, 2.0, n),
        albedo=rng.uniform(0, 1, (n, 3)),
    )


def test_tight_membership_is_subset_of_reference(random_scene):
    cam = Camera.create(position=(0.0, 0.0, -4.0), width=32, height=32)
    tight = np.asarray(tile_membership(random_scene, cam.view_matrix, 4))
    ref = np.asarray(
        tile_membership(random_scene, cam.view_matrix, 4, mode="reference")
    )
    assert np.all(ref | ~tight), "tight membership must be a subset"


def test_membership_matches_reference_rule(random_scene):
    cam = Camera.create(position=(0.0, 0.0, -4.0), width=32, height=32)
    for tiles in (2, 4):
        ours = np.asarray(
            tile_membership(random_scene, cam.view_matrix, tiles, mode="reference")
        )
        ref = _reference_membership(random_scene, cam.view_matrix, tiles)
        np.testing.assert_array_equal(ours, ref)


def test_behind_camera_culled():
    scene = make_scene(
        mu=[[0.0, 0.0, 1.5], [0.0, 0.0, -10.0]],
        sigma=[0.3, 0.3],
        magnitude=[1.0, 1.0],
        albedo=[[1, 0, 0], [0, 1, 0]],
    )
    cam = Camera.create(position=(0.0, 0.0, -4.0), width=16, height=16)
    m = np.asarray(tile_membership(scene, cam.view_matrix, 2))
    assert m[:, 0].any()
    assert not m[:, 1].any()


def test_tile_indices_and_gather(random_scene):
    cam = Camera.create(position=(0.0, 0.0, -4.0), width=32, height=32)
    idx, counts = tile_indices(random_scene, cam.view_matrix, 4, capacity=48)
    member = np.asarray(tile_membership(random_scene, cam.view_matrix, 4))
    np.testing.assert_array_equal(np.asarray(counts), member.sum(-1))
    tiled = gather_tiles(random_scene, idx)
    assert tiled.mu.shape == (16, 48, 3)
    i = np.asarray(idx)
    pad = i == random_scene.n
    np.testing.assert_allclose(np.asarray(tiled.magnitude)[pad], 0.0)
    np.testing.assert_allclose(np.asarray(tiled.sigma)[pad], 1.0)
    # non-pad entries gather the right rows
    t, k = np.nonzero(~pad)
    np.testing.assert_allclose(
        np.asarray(tiled.mu)[t, k], np.asarray(random_scene.mu)[i[t, k]]
    )


def test_tiled_render_matches_untiled():
    scene = grid_scene(4)
    cam = Camera.create(position=(0.0, 0.0, -4.0), width=32, height=32)
    full = np.asarray(render(scene, cam, q_block=16, ray_block=256))
    tiled = np.asarray(render_tiled(scene, cam, tiles=4, q_block=16, tile_batch=4))
    # Culling may drop <1/255-visible contributions (by design, 3.3 sigma
    # bound); everything else must match.
    assert np.abs(full - tiled).max() < 2.0 / 255.0


def test_tile_centers_layout():
    c = np.asarray(tile_centers(2))
    np.testing.assert_allclose(c, [[-0.5, -0.5], [0.5, -0.5], [-0.5, 0.5], [0.5, 0.5]])


def test_capacity_overflow_raises(random_scene):
    cam = Camera.create(position=(0.0, 0.0, -4.0), width=32, height=32)
    m = max_tile_count(random_scene, cam.view_matrix, 2)
    assert m > 2
    with pytest.raises(ValueError, match="overflow"):
        render_tiled(random_scene, cam, tiles=2, capacity=2, q_block=2, tile_batch=4)


def test_bucketed_render_matches_single_bucket():
    """Two-bucket scheduling must reproduce the single-capacity tiled frame
    exactly (static shapes, data-dependent bucket membership)."""
    from sgrt_tpu.models.gaussians import grid_scene
    from sgrt_tpu.ops.frame import probe_buckets, render_orbit_frame

    scene = grid_scene(8)
    cfg = probe_buckets(scene, [0.0, 45.0], -4.0, 1.0, 4)
    assert cfg.cap_sparse <= cfg.cap_dense
    img_b, _ = render_orbit_frame(scene, 23.0, width=64, height=64, tiles=4,
                                  capacity=64, backend="pallas",
                                  bucket_cfg=cfg)
    img_p, _ = render_orbit_frame(scene, 23.0, width=64, height=64, tiles=4,
                                  capacity=64, backend="pallas")
    np.testing.assert_allclose(np.asarray(img_b), np.asarray(img_p),
                               atol=2e-6)


def test_rectangular_grid_matches_square():
    """A rectangular (tx, ty) tile grid must produce the same image as the
    square grid and the untiled render (lane-packing optimization: tiles
    sized so rays/tile = 128)."""
    import numpy as np

    from sgrt_tpu.models.gaussians import grid_scene
    from sgrt_tpu.ops.frame import render_orbit_frame

    scene = grid_scene(8)
    kw = dict(width=64, height=64, capacity=64, backend="xla")
    img_ut, _ = render_orbit_frame(scene, 23.0, use_tiling=False, **kw)
    ut = np.asarray(img_ut)
    # tolerance = the 3.3 sigma culling bound: any tile shape may drop
    # contributions below the 8-bit visibility threshold (1/255, thesis
    # main.tex:520-541), so tiled-vs-untiled agreement is ~4e-3, not exact
    for tiles in (4, (4, 8), (8, 2), (2, 8)):
        img, ovf = render_orbit_frame(scene, 23.0, tiles=tiles, **kw)
        assert int(ovf) == 0
        np.testing.assert_allclose(np.asarray(img), ut, atol=4e-3,
                                   err_msg=str(tiles))


def test_gather_native_matches_onehot():
    """gather_tiles switches to the native DMA gather past
    ONEHOT_MAX_SCENE_ROWS (fitting-scale scenes, scripts/large_n.py); both
    strategies must be bit-identical — the one-hot matmul is exact (1*v)."""
    import numpy as np

    import sgrt_tpu.ops.tiling as tiling
    from sgrt_tpu.models.gaussians import GaussianScene
    from sgrt_tpu.ops.tiling import gather_tiles

    rng = np.random.default_rng(3)
    n = 200
    scene = GaussianScene(
        mu=jnp.asarray(rng.normal(size=(n, 3)), jnp.float32),
        sigma=jnp.asarray(rng.uniform(0.1, 1.0, (n,)), jnp.float32),
        magnitude=jnp.asarray(rng.uniform(0.5, 1.5, (n,)), jnp.float32),
        albedo=jnp.asarray(rng.uniform(0, 1, (n, 3)), jnp.float32),
    )
    idx = jnp.asarray(
        rng.integers(0, n + 1, size=(7, 16)), jnp.int32)  # incl. dummy n
    saved = tiling.ONEHOT_MAX_SCENE_ROWS
    try:
        tiling.ONEHOT_MAX_SCENE_ROWS = 1 << 30
        via_onehot = gather_tiles(scene, idx)
        tiling.ONEHOT_MAX_SCENE_ROWS = 0
        via_native = gather_tiles(scene, idx)
    finally:
        tiling.ONEHOT_MAX_SCENE_ROWS = saved
    for f in ("mu", "sigma", "magnitude", "albedo"):
        np.testing.assert_array_equal(
            np.asarray(getattr(via_onehot, f)),
            np.asarray(getattr(via_native, f)), err_msg=f)


def test_tiling_fitting_scale():
    """Fitting-scale envelope (N = 50k): membership, compaction and the
    native-path gather stay correct and static-shaped. The reference's
    tile_gaussians never faced this N (max 3,644, rt.cpp:29-69)."""
    import numpy as np

    from sgrt_tpu.models.gaussians import GaussianScene
    from sgrt_tpu.ops.frame import orbit_camera
    from sgrt_tpu.ops.tiling import gather_tiles, tile_indices

    n = 50_000
    rng = np.random.default_rng(0)
    v = rng.normal(size=(n, 3)).astype(np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    scene = GaussianScene(
        mu=jnp.asarray(v),
        sigma=jnp.full((n,), 0.05, jnp.float32),
        magnitude=jnp.ones((n,), jnp.float32),
        albedo=jnp.asarray(0.5 * v + 0.5, jnp.float32),
    )
    cam = orbit_camera(30.0, -4.0, 1.0, 8, 8)
    from sgrt_tpu.ops.tiling import max_tile_count

    cap = -(-max_tile_count(scene, cam.view_matrix, (4, 4)) // 128) * 128
    idx, counts = tile_indices(scene, cam.view_matrix, (4, 4), cap)
    assert idx.shape == (16, cap)
    assert int(jnp.max(counts)) <= cap, "undersized test capacity"
    tiled = gather_tiles(scene, idx)  # native path (n > threshold)
    assert tiled.mu.shape == (16, cap, 3)
    # spot-check one tile row against direct indexing
    row = np.asarray(idx[3])
    live = row[row < n]
    np.testing.assert_array_equal(
        np.asarray(tiled.mu[3])[: len(live)], v[live])
    # padding rows must be the inert dummy (sigma=1, magnitude=0)
    if len(live) < cap:
        np.testing.assert_array_equal(
            np.asarray(tiled.sigma[3])[len(live):], 1.0)
        np.testing.assert_array_equal(
            np.asarray(tiled.magnitude[3])[len(live):], 0.0)
