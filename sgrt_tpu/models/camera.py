"""Pinhole camera with a precomputed world-space projection plane.

Reproduces the reference camera math (src/vrt/camera.cpp:7-71) without the
GLM dependency:

  - view matrix = lookAt(pos, pos+front, up) then post-translated by
    focal_length*front (glm::translate post-multiplies: V = L @ T(f*front)),
    camera.cpp:52
  - per-pixel projection-plane point = inverse(view) @ (ndc_x, ndc_y, 0, 1)
    with ndc = (-1 + j/(w/2), -1 + i/(h/2)), camera.cpp:60-69
  - turn(yaw, pitch) spherical front vector + Gram-Schmidt right/up,
    camera.cpp:7-23

Everything is jnp and jit-compatible; the projection plane is generated
on-device on demand (no stored H*W buffers — the TPU analog of the
aligned_malloc'ed plane arrays is a fused broadcast).
"""

from __future__ import annotations

import flax.struct
import jax
import jax.numpy as jnp


def _mm(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Full-f32 matmul — TPU's default matmul precision is bf16, which is far
    too coarse for view-matrix chains."""
    return jnp.matmul(a, b, precision=jax.lax.Precision.HIGHEST)


def look_at(eye: jnp.ndarray, center: jnp.ndarray, up: jnp.ndarray) -> jnp.ndarray:
    """Right-handed lookAt view matrix (glm::lookAtRH semantics), (4,4)."""
    f = center - eye
    f = f / jnp.linalg.norm(f)
    s = jnp.cross(f, up)
    s = s / jnp.linalg.norm(s)
    u = jnp.cross(s, f)
    return jnp.stack(
        [
            jnp.concatenate([s, -jnp.dot(s, eye)[None]]),
            jnp.concatenate([u, -jnp.dot(u, eye)[None]]),
            jnp.concatenate([-f, jnp.dot(f, eye)[None]]),
            jnp.array([0.0, 0.0, 0.0, 1.0], jnp.float32),
        ]
    )


def translate(m: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """glm::translate(m, v) = m @ T(v) (post-multiplication)."""
    t = jnp.eye(4, dtype=jnp.float32).at[:3, 3].set(v)
    return _mm(m, t)


def inverse_rigid(m: jnp.ndarray) -> jnp.ndarray:
    """Inverse of a rigid transform [[R, t], [0, 1]] = [[R^T, -R^T t], [0, 1]].

    The view matrix is always rigid (lookAt + translation), and the analytic
    inverse avoids the generic LU path (whose TPU compile is pathologically
    slow inside jit)."""
    r = m[:3, :3]
    t = m[:3, 3]
    inv = jnp.eye(4, dtype=m.dtype)
    inv = inv.at[:3, :3].set(r.T)
    inv = inv.at[:3, 3].set(-_mm(r.T, t))
    return inv


def rotate_y(angle_deg: jnp.ndarray) -> jnp.ndarray:
    """Rotation about the +Y axis (glm::rotate(mat4(1), radians(a), (0,1,0))), (4,4)."""
    a = jnp.deg2rad(angle_deg)
    c, s = jnp.cos(a), jnp.sin(a)
    return jnp.array(
        [
            [c, 0.0, s, 0.0],
            [0.0, 1.0, 0.0, 0.0],
            [-s, 0.0, c, 0.0],
            [0.0, 0.0, 0.0, 1.0],
        ],
        jnp.float32,
    )


def front_from_angles(yaw_deg, pitch_deg, constrain: bool = True) -> jnp.ndarray:
    """Spherical front vector from yaw/pitch in degrees (camera.cpp:7-19)."""
    pitch = jnp.clip(pitch_deg, -89.0, 89.0) if constrain else jnp.asarray(pitch_deg)
    yaw_r, pitch_r = jnp.deg2rad(yaw_deg), jnp.deg2rad(pitch)
    f = jnp.stack(
        [
            jnp.cos(yaw_r) * jnp.cos(pitch_r),
            jnp.sin(pitch_r),
            jnp.sin(yaw_r) * jnp.cos(pitch_r),
        ]
    )
    return f / jnp.linalg.norm(f)


@flax.struct.dataclass
class Camera:
    """Pinhole camera pytree. width/height are static (compile-time) fields."""

    position: jnp.ndarray      # (3,)
    front: jnp.ndarray         # (3,)
    up: jnp.ndarray            # (3,)
    right: jnp.ndarray         # (3,)
    world_up: jnp.ndarray      # (3,)
    view_matrix: jnp.ndarray   # (4,4)
    focal_length: jnp.ndarray  # scalar
    width: int = flax.struct.field(pytree_node=False, default=256)
    height: int = flax.struct.field(pytree_node=False, default=256)

    @classmethod
    def create(
        cls,
        position=(0.0, 0.0, 0.0),
        up=(0.0, 1.0, 0.0),
        yaw: float = -90.0,
        pitch: float = 0.0,
        width: int = 256,
        height: int = 256,
        focal_length: float = 1.0,
    ) -> "Camera":
        """Matches camera_t's ctor + initial turn(yaw, pitch) (camera.cpp:25-36)."""
        cam = cls(
            position=jnp.asarray(position, jnp.float32),
            front=jnp.array([0.0, 0.0, 1.0], jnp.float32),
            up=jnp.asarray(up, jnp.float32),
            right=jnp.zeros(3, jnp.float32),
            world_up=jnp.asarray(up, jnp.float32),
            view_matrix=jnp.eye(4, dtype=jnp.float32),
            focal_length=jnp.asarray(focal_length, jnp.float32),
            width=width,
            height=height,
        )
        return cam.turn(yaw, pitch)

    def turn(self, yaw, pitch, constrain: bool = True) -> "Camera":
        front = front_from_angles(yaw, pitch, constrain)
        right = jnp.cross(front, self.world_up)
        right = right / jnp.linalg.norm(right)
        up = jnp.cross(right, front)
        up = up / jnp.linalg.norm(up)
        view = translate(
            look_at(self.position, self.position + front, up),
            self.focal_length * front,
        )
        return self.replace(front=front, right=right, up=up, view_matrix=view)

    def with_position(self, position) -> "Camera":
        return self.replace(position=jnp.asarray(position, jnp.float32))

    def update(self) -> "Camera":
        """Recompute the view matrix for the current pose (camera.cpp:50-52)."""
        view = translate(
            look_at(self.position, self.position + self.front, self.up),
            self.focal_length * self.front,
        )
        return self.replace(view_matrix=view)

    def projection_plane(self) -> jnp.ndarray:
        """World-space points of the focal plane, one per pixel: (H*W, 3).

        Pixel (row i, col j) → NDC (-1 + j/(w/2), -1 + i/(h/2), 0) mapped
        through inverse(view) (camera.cpp:60-69); stored row-major [i*w+j].
        """
        w, h = self.width, self.height
        j = jnp.arange(w, dtype=jnp.float32)
        i = jnp.arange(h, dtype=jnp.float32)
        x = -1.0 + j / (w / 2.0)
        y = -1.0 + i / (h / 2.0)
        xx = jnp.broadcast_to(x[None, :], (h, w))
        yy = jnp.broadcast_to(y[:, None], (h, w))
        ndc = jnp.stack([xx, yy, jnp.zeros_like(xx), jnp.ones_like(xx)], axis=-1)
        inv = inverse_rigid(self.view_matrix)
        pts = _mm(ndc.reshape(-1, 4), inv.T)
        return pts[:, :3]

    def rays(self, origin: jnp.ndarray | None = None):
        """(origin (3,), unit directions (H*W, 3)) toward the projection plane
        (reference ray setup: rt.h:232-237 — dir = normalize(plane - origin))."""
        o = self.position if origin is None else jnp.asarray(origin, jnp.float32)
        plane = self.projection_plane()
        d = plane - o[None, :]
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        return o, d


def orbit_position(position: jnp.ndarray, angle_deg) -> jnp.ndarray:
    """Rotate the camera position about the world Y axis (main.cpp:330-332)."""
    p = _mm(rotate_y(angle_deg), jnp.concatenate([position, jnp.ones(1, jnp.float32)]))
    return p[:3]
