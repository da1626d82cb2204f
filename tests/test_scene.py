"""Scene construction, padding, and obj loading (reference rules from
src/vrt/gaussians-from-file.cpp and src/vrt/types.cpp)."""

import numpy as np

from sgrt_tpu.models.gaussians import (
    grid_scene,
    make_scene,
    pad_scene,
    scene_from_vertices,
)
from sgrt_tpu.utils.objio import read_obj_vertices


def test_pad_scene_alignment():
    s = grid_scene(3)  # n = 9
    p = pad_scene(s, 8)
    assert p.n == 16
    np.testing.assert_allclose(np.asarray(p.sigma[9:]), 1.0)
    np.testing.assert_allclose(np.asarray(p.magnitude[9:]), 0.0)


def test_pad_noop_when_aligned():
    s = grid_scene(4)  # n = 16
    assert pad_scene(s, 8) is s


def test_sigma_heuristic_thresholds():
    # gaussians-from-file.cpp:26-30: <300 → 0.3, <1000 → 0.15, else 0.05
    v = np.random.default_rng(0).normal(size=(299, 3)).astype(np.float32)
    assert float(scene_from_vertices(v).sigma[0]) == np.float32(0.3)
    v = np.random.default_rng(0).normal(size=(300, 3)).astype(np.float32)
    assert float(scene_from_vertices(v).sigma[0]) == np.float32(0.15)
    v = np.random.default_rng(0).normal(size=(1000, 3)).astype(np.float32)
    assert float(scene_from_vertices(v).sigma[0]) == np.float32(0.05)


def test_albedo_rule():
    v = np.array([[2.0, 0.0, 0.0]], np.float32)
    s = scene_from_vertices(v)
    np.testing.assert_allclose(np.asarray(s.albedo[0]), [1.0, 0.5, 0.5], atol=1e-6)


def test_obj_parser(tmp_path):
    f = tmp_path / "tri.obj"
    f.write_text(
        "# comment\n"
        "v 0.0 1.0 2.0\n"
        "vn 0 0 1\n"
        "v -1.5 2.5 -3.5\n"
        "vt 0 0\n"
        "f 1 2 1\n"
    )
    v = read_obj_vertices(str(f))
    np.testing.assert_allclose(v, [[0, 1, 2], [-1.5, 2.5, -3.5]])


def test_make_scene_shapes():
    s = make_scene([[0, 0, 1]], [0.5], [1.0], [[1, 0, 0]])
    assert s.mu.shape == (1, 3)
    assert s.pdf(np.zeros(3)).shape == (1,)
