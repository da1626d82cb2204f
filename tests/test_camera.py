"""Camera math invariants, pinned to the reference's (quirky) conventions:
lookAt + focal-length post-translation (camera.cpp:52) puts the projection
plane at `position - focal*front`, so rays effectively travel along -front."""

import jax.numpy as jnp
import numpy as np

from sgrt_tpu.models.camera import Camera, orbit_position, rotate_y


def test_default_front_is_minus_z():
    cam = Camera.create(position=(0.0, 0.0, -4.0))
    np.testing.assert_allclose(np.asarray(cam.front), [0.0, 0.0, -1.0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(cam.right), [1.0, 0.0, 0.0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(cam.up), [0.0, 1.0, 0.0], atol=1e-6)


def test_view_matrix_maps_position():
    cam = Camera.create(position=(1.0, 2.0, -3.0), yaw=-50.0, pitch=10.0, focal_length=1.5)
    v = np.asarray(cam.view_matrix)
    p = v @ np.array([1.0, 2.0, -3.0, 1.0])
    # V = lookAt @ T(f*front): camera center sits at view-space (0, 0, -focal).
    np.testing.assert_allclose(p, [0.0, 0.0, -1.5, 1.0], atol=1e-5)


def test_projection_plane_center_and_ray():
    cam = Camera.create(position=(0.0, 0.0, -4.0), width=8, height=8)
    plane = np.asarray(cam.projection_plane()).reshape(8, 8, 3)
    # NDC (0,0) is at pixel (h/2, w/2); plane center = pos - focal*front.
    np.testing.assert_allclose(plane[4, 4], [0.0, 0.0, -3.0], atol=1e-5)
    o, dirs = cam.rays()
    d = np.asarray(dirs).reshape(8, 8, 3)[4, 4]
    np.testing.assert_allclose(d, -np.asarray(cam.front), atol=1e-5)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(dirs), axis=-1), 1.0, atol=1e-5)


def test_projection_plane_layout_row_major():
    cam = Camera.create(position=(0.0, 0.0, -4.0), width=4, height=2)
    plane = np.asarray(cam.projection_plane())
    assert plane.shape == (8, 3)
    # x varies fastest (j index), matching camera.cpp:66 [i*w + j] layout.
    assert abs(plane[1, 0] - plane[0, 0]) > 1e-6
    assert abs(plane[1, 1] - plane[0, 1]) < 1e-6


def test_orbit_preserves_radius_and_y():
    p = jnp.array([0.0, 1.0, -4.0])
    q = orbit_position(p, 37.0)
    np.testing.assert_allclose(np.linalg.norm(q), np.linalg.norm(p), rtol=1e-6)
    np.testing.assert_allclose(q[1], p[1], atol=1e-6)


def test_rotate_y_matches_glm():
    r = np.asarray(rotate_y(90.0))
    # glm::rotate about +Y: x-axis → -z? (x,z) -> (c x + s z, -s x + c z)
    np.testing.assert_allclose(r[:3, :3] @ np.array([1.0, 0.0, 0.0]), [0.0, 0.0, -1.0], atol=1e-6)
    np.testing.assert_allclose(r[:3, :3] @ np.array([0.0, 0.0, 1.0]), [1.0, 0.0, 0.0], atol=1e-6)


def test_full_orbit_returns_home():
    cam = Camera.create(position=(0.0, 0.0, -4.0), width=4, height=4)
    pos = cam.position
    angle = -90.0
    for _ in range(8):
        pos = orbit_position(pos, 45.0)
        angle -= 45.0
        cam = cam.with_position(pos).turn(angle, 0.0)
    np.testing.assert_allclose(np.asarray(pos), [0.0, 0.0, -4.0], atol=1e-4)
