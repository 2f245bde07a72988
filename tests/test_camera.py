"""Camera tests: pinhole ray math vs the reference formulas, orbit camera
state machine (Parellel/interactive_camera.cu)."""
import math

import jax.numpy as jnp
import numpy as np

from realtrace_tpu.render.camera import Camera, InteractiveCamera, image_from_buffer, mouse_drag

DT = jnp.float64


def ref_ray_dir(cam, i, j):
    """Direct transliteration of Serial/camera.cpp:33-44."""
    pos = np.asarray(cam.position, float)
    tgt = np.asarray(cam.target, float)
    up = np.asarray(cam.up, float)
    up = up / np.linalg.norm(up)
    w = pos - tgt
    w = w / np.linalg.norm(w)
    u = np.cross(up, w)
    u = u / np.linalg.norm(u)
    v = np.cross(w, u)
    v = v / np.linalg.norm(v)
    aspect = cam.width / cam.height
    focal = 1.0 / (2.0 * math.tan(math.radians(float(cam.fovy)) / 2.0))
    xw = aspect * (i - cam.width / 2.0 + 0.5) / cam.width
    yw = (j - cam.height / 2.0 + 0.5) / cam.height
    d = -w * focal + u * xw + v * yw
    return d / np.linalg.norm(d)


def test_ray_directions_match_reference():
    cam = Camera.make((60, 60, 0), (0, 0, 0), (0, 1, 0), 45.0, 16, 12, dtype=DT)
    dirs = np.asarray(cam.ray_directions()).reshape(-1, 3)
    for (i, j) in [(0, 0), (15, 11), (8, 6), (3, 9)]:
        np.testing.assert_allclose(dirs[i + j * 16], ref_ray_dir(cam, i, j), atol=1e-12)


def test_rays_are_normalized():
    cam = Camera.make((1, 2, 3), (0, 0, 0), (0, 1, 0), 60.0, 9, 7, dtype=DT)
    d = np.asarray(cam.ray_directions())
    np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-12)


def test_image_from_buffer_flips_rows():
    cam = Camera.make((0, 0, 5), (0, 0, 0), (0, 1, 0), 45.0, 2, 2, dtype=DT)
    buf = jnp.arange(12, dtype=DT).reshape(4, 3)
    img = np.asarray(image_from_buffer(buf, cam))
    # buffer index i + j*W, row j=0 is the bottom → last row of the image
    np.testing.assert_allclose(img[1, 0], buf[0])
    np.testing.assert_allclose(img[0, 0], buf[2])


def test_orbit_camera_clamps_and_wraps():
    c = InteractiveCamera()
    c.change_yaw(7.0)
    assert 0.0 <= c.yaw < 2 * math.pi
    c.change_pitch(10.0)
    assert c.pitch <= math.pi / 2 - 0.05 + 1e-9
    c.change_radius(1e9)
    assert c.radius <= 100.0
    c.change_radius(-0.999999)
    c.change_radius(-0.999999)
    assert c.radius >= 0.2


def test_orbit_camera_builds_lookat():
    c = InteractiveCamera(yaw=0.3, pitch=0.2, radius=5.0)
    cam = c.build_render_camera(dtype=DT)
    eye = np.asarray(cam.position)
    np.testing.assert_allclose(np.linalg.norm(eye - np.asarray(cam.target)), 1.0, atol=1e-6)
    np.testing.assert_allclose(np.linalg.norm(eye), 5.0, atol=1e-6)
    # fov_y derived from fov_x via the atan/tan relation (ref :58-61)
    assert 0 < c.fov_y <= c.fov_x


def test_mouse_drag_semantics():
    c = InteractiveCamera()
    y0, p0 = c.yaw, c.pitch
    mouse_drag(c, "left", 10.0, 5.0)
    assert c.yaw != y0 and c.pitch != p0
    r0 = c.radius
    mouse_drag(c, "right", 0.0, -10.0)
    assert c.radius > r0
