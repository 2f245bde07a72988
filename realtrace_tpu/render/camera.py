"""Pinhole + interactive orbit cameras as pure functions.

Ref: ``Serial/camera.cpp`` (pinhole basis + per-pixel ray directions),
``Parellel/interactive_camera.cu:64-102`` (orbit camera). The whole image's
ray directions are produced as one dense ``(H*W, 3)`` batch.
"""
from __future__ import annotations

import dataclasses
import math

import jax.numpy as jnp
import numpy as np
from flax import struct
from jax import Array, lax

from realtrace_tpu.core import vec


@struct.dataclass
class Camera:
    """Pinhole camera. Basis math mirrors Serial/camera.cpp:4-25.

    ``width``/``height`` are static (pytree aux data); position/target/up are
    differentiable leaves so pixel gradients can flow to camera pose.
    """

    position: Array  # (3,)
    target: Array    # (3,)
    up: Array        # (3,)
    fovy: Array      # () degrees, angular extent of image height
    width: int = struct.field(pytree_node=False, default=512)
    height: int = struct.field(pytree_node=False, default=512)

    @staticmethod
    def make(position, target, up, fovy, width, height, dtype=jnp.float32) -> "Camera":
        return Camera(
            position=jnp.asarray(position, dtype), target=jnp.asarray(target, dtype),
            up=jnp.asarray(up, dtype), fovy=jnp.asarray(fovy, dtype),
            width=int(width), height=int(height))

    def basis(self):
        """(u, v, w): camera looks down -w. Ref: Serial/camera.cpp:10-18."""
        up = vec.normalize(self.up)
        w = vec.normalize(self.position - self.target)   # w = -line_of_sight
        u = vec.normalize(vec.cross(up, w))
        v = vec.normalize(vec.cross(w, u))
        return u, v, w

    def ray_directions(self) -> Array:
        """All pixel ray directions as (H*W, 3), pixel order index = i + j*W
        with i = column, j = row-from-bottom (reference bitmap layout,
        Serial/camera.cpp:46-52).

        Ref: get_ray_direction, Serial/camera.cpp:33-44.
        """
        dt = self.position.dtype
        u, v, w = self.basis()
        aspect = self.width / self.height
        focal = 1.0 / (2.0 * jnp.tan(self.fovy * (math.pi / 180.0) / 2.0))
        i = jnp.arange(self.width, dtype=dt)
        j = jnp.arange(self.height, dtype=dt)
        xw = aspect * (i - self.width / 2.0 + 0.5) / self.width      # (W,)
        yw = (j - self.height / 2.0 + 0.5) / self.height             # (H,)
        d = (-w)[None, None, :] * focal \
            + u[None, None, :] * xw[None, :, None] \
            + v[None, None, :] * yw[:, None, None]                    # (H, W, 3)
        d = vec.normalize(d)
        return d.reshape(-1, 3)

    def ray_origins(self) -> Array:
        return jnp.broadcast_to(self.position, (self.height * self.width, 3))

    def ray_directions_at(self, i_idx, j_idx) -> Array:
        """Ray directions for explicit pixel coordinate arrays: ``i_idx``
        columns, ``j_idx`` rows-from-bottom, each (R,). Lets the pipeline
        generate rays DIRECTLY in tile-major order — pure elementwise math,
        no post-hoc permutation gather. Same formula as ray_directions
        (Serial/camera.cpp:33-44)."""
        dt = self.position.dtype
        u, v, w = self.basis()
        aspect = self.width / self.height
        focal = 1.0 / (2.0 * jnp.tan(self.fovy * (math.pi / 180.0) / 2.0))
        xw = aspect * (jnp.asarray(i_idx, dt) - self.width / 2.0 + 0.5) / self.width
        yw = (jnp.asarray(j_idx, dt) - self.height / 2.0 + 0.5) / self.height
        d = (-w)[None, :] * focal + u[None, :] * xw[:, None] + v[None, :] * yw[:, None]
        return vec.normalize(d)

    def ray_direction_rows(self, i_idx, j_idx) -> tuple[Array, Array, Array]:
        """Normalized ray-direction COMPONENTS (dx, dy, dz), each (R,).

        Row-major counterpart of ``ray_directions_at`` for consumers that want
        component rows (the accel's (FEAT, R) feature matrix) — building rows
        directly avoids a (R,3)→(3,R) relayout of the whole wavefront.
        """
        dt = self.position.dtype
        u, v, w = self.basis()
        aspect = self.width / self.height
        focal = 1.0 / (2.0 * jnp.tan(self.fovy * (math.pi / 180.0) / 2.0))
        xw = aspect * (jnp.asarray(i_idx, dt) - self.width / 2.0 + 0.5) / self.width
        yw = (jnp.asarray(j_idx, dt) - self.height / 2.0 + 0.5) / self.height
        dx = -w[0] * focal + u[0] * xw + v[0] * yw
        dy = -w[1] * focal + u[1] * xw + v[1] * yw
        dz = -w[2] * focal + u[2] * xw + v[2] * yw
        # 1/sqrt (not rsqrt) to match vec.normalize bit-for-bit
        inv = 1.0 / jnp.sqrt(dx * dx + dy * dy + dz * dz)
        return dx * inv, dy * inv, dz * inv

    def ray_directions_tile(self, i0, j0, tile_w: int, tile_h: int) -> Array:
        """Ray directions for the pixel tile [i0, i0+tile_w) x [j0, j0+tile_h)
        as (tile_h*tile_w, 3) — the unit of multi-chip pixel-tile sharding.
        ``i0``/``j0`` may be traced (e.g. derived from ``lax.axis_index``).
        """
        dt = self.position.dtype
        u, v, w = self.basis()
        aspect = self.width / self.height
        focal = 1.0 / (2.0 * jnp.tan(self.fovy * (math.pi / 180.0) / 2.0))
        i = i0 + jnp.arange(tile_w, dtype=dt)
        j = j0 + jnp.arange(tile_h, dtype=dt)
        xw = aspect * (i - self.width / 2.0 + 0.5) / self.width
        yw = (j - self.height / 2.0 + 0.5) / self.height
        d = (-w)[None, None, :] * focal \
            + u[None, None, :] * xw[None, :, None] \
            + v[None, None, :] * yw[:, None, None]
        return vec.normalize(d).reshape(-1, 3)


def image_from_buffer(buf: Array, camera: Camera) -> Array:
    """Reorder the flat (H*W, 3) color buffer into a top-down (H, W, 3) image.

    The reference bitmap stores row j at the bottom (OpenGL convention,
    Serial/camera.cpp:46-52); PNG rows go top-down, hence the flip.
    """
    return buf.reshape(camera.height, camera.width, 3)[::-1]


@dataclasses.dataclass
class InteractiveCamera:
    """Orbit camera: yaw/pitch/radius around a center point.

    Pure-python state machine mirroring ``Parellel/interactive_camera.cu``;
    ``build_render_camera`` converts spherical coordinates to a pinhole
    ``Camera`` each frame (ref :64-81). Drives the flythrough app and replaces
    the GLUT mouse handlers (``Parellel/interactions.cu:12-57``).
    """

    center: np.ndarray = dataclasses.field(default_factory=lambda: np.zeros(3))
    yaw: float = 0.0
    pitch: float = 0.3
    radius: float = 10.0
    aperture_radius: float = 0.04
    resolution: tuple = (512, 512)
    fov_x: float = 45.0

    # --- controls (ref Parellel/interactive_camera.cu:21-46) -------------
    def change_yaw(self, m: float):
        self.yaw = (self.yaw + m) % (2.0 * math.pi)

    def change_pitch(self, m: float):
        pad = 0.05
        self.pitch = float(np.clip(self.pitch + m, -(math.pi / 2) + pad, (math.pi / 2) - pad))

    def change_radius(self, m: float):
        self.radius = float(np.clip(self.radius * (1.0 + m), 0.2, 100.0))

    def change_altitude(self, m: float):
        self.center = self.center + np.array([0.0, m, 0.0])

    def change_aperture_diameter(self, m: float):
        self.aperture_radius = float(np.clip(self.aperture_radius + (self.aperture_radius + 0.01) * m, 0.0, 25.0))

    @property
    def fov_y(self) -> float:
        """Derived vertical FOV (ref setFOVX, Parellel/interactive_camera.cu:58-61)."""
        rx, ry = self.resolution
        return math.degrees(2.0 * math.atan(math.tan(math.radians(self.fov_x) * 0.5) * (ry / rx)))

    def build_render_camera(self, dtype=jnp.float32) -> Camera:
        """Spherical → eye position; ref buildRenderCamera (:64-81)."""
        d = np.array([
            math.sin(self.yaw) * math.cos(self.pitch),
            math.sin(self.pitch),
            math.cos(self.yaw) * math.cos(self.pitch),
        ])
        eye = self.center + d * self.radius
        # reference passes viewDirection as "target"; for a pinhole camera the
        # look-at point is eye + viewDirection
        target = eye - d
        return Camera.make(eye, target, (0.0, 1.0, 0.0), self.fov_y,
                           self.resolution[0], self.resolution[1], dtype=dtype)


def mouse_drag(cam: InteractiveCamera, button: str, dx: float, dy: float) -> None:
    """GLUT mouse-motion semantics (ref Parellel/interactions.cu:27-57):
    left drag = yaw/pitch, middle = altitude, right = radius.
    """
    scale = 0.005
    if button == "left":
        cam.change_yaw(-dx * scale)
        cam.change_pitch(-dy * scale)
    elif button == "middle":
        cam.change_altitude(-dy * scale * 10.0)
    elif button == "right":
        cam.change_radius(-dy * scale)
