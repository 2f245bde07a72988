"""App-layer tests: CLI, flythrough, sample kernels (L3 of the layer map)."""
import numpy as np
import pytest

from realtrace_tpu.apps import samples
from realtrace_tpu.apps.cli import main as cli_main
from realtrace_tpu.io.image import load_png


def test_cli_renders_sphere_plane(tmp_path):
    out = tmp_path / "out.png"
    rc = cli_main(["--scene", "sphere_plane", "--width", "32", "--height", "24",
                   "--depth", "1", "--accel", "bruteforce", "--out", str(out),
                   "--cpu"])
    assert rc == 0 and out.exists()
    img = load_png(out)
    assert img.shape == (24, 32, 3)
    # background must be visible (blue dominant in corners)
    assert img[0, 0, 2] > img[0, 0, 0]


def test_cli_obj_scene(tmp_path, reference_assets):
    out = tmp_path / "tet.png"
    rc = cli_main(["--scene", "serial", "--obj", str(reference_assets / "tetrahedron.obj"),
                   "--width", "16", "--height", "16", "--depth", "1",
                   "--accel", "chunked", "--out", str(out), "--cpu"])
    assert rc == 0 and out.exists()


def test_flythrough_runs(reference_assets, tmp_path):
    import jax.numpy as jnp

    from realtrace_tpu.apps import scenes
    from realtrace_tpu.apps.flythrough import run_flythrough
    from realtrace_tpu.core.types import RenderConfig
    from realtrace_tpu.render.camera import InteractiveCamera

    scene, _ = scenes.serial_obj_scene(reference_assets / "tetrahedron.obj",
                                       dtype=jnp.float32)
    cam = InteractiveCamera(radius=120.0, resolution=(16, 16))
    cfg = RenderConfig(max_depth=1, accel="bruteforce")
    images, fps = run_flythrough(scene, cam, cfg, frames=3, out_dir=str(tmp_path))
    assert len(images) == 3
    assert (tmp_path / "frame_0002.png").exists()
    # camera actually moved: successive frames differ
    assert not np.allclose(np.asarray(images[0]), np.asarray(images[1]))


def test_flashlight_kernel():
    img = np.asarray(samples.flashlight(64, 48, (32, 24)))
    assert img.shape == (48, 64, 4)
    assert img[24, 32, 0] == 255          # full intensity at the light
    assert img[0, 0, 0] < 255             # decays with distance
    assert (img[..., 3] == 255).all()


def test_stability_kernel_modes():
    for sys in (0, 1, 2):
        img = np.asarray(samples.stability(32, 32, 0.1, sys))
        assert img.shape == (32, 32, 4)
        assert (img[16, :, 1] == 255).all()   # axis line
    # linear damped (sys 0) trajectories decay → blue dominates off-axis
    img0 = np.asarray(samples.stability(64, 64, 0.5, 0))
    off = img0[10, 10]
    assert off[2] > off[0]


def test_invert_cli_recovers(tmp_path):
    from realtrace_tpu.apps.invert import main as invert_main

    rc = invert_main(["--scene", "sphere_plane", "--fields", "sph_color",
                      "--steps", "40", "--lr", "0.05", "--width", "16",
                      "--height", "12", "--out-dir", str(tmp_path),
                      "--ckpt-every", "20", "--cpu"])
    assert rc == 0
    assert (tmp_path / "recovered.png").exists()
    assert (tmp_path / "target.png").exists()
    assert any((tmp_path / "ckpt").iterdir())
    rec = load_png(tmp_path / "recovered.png")
    tgt = load_png(tmp_path / "target.png")
    # the optimized render should be close to the target almost everywhere
    assert (np.abs(rec - tgt).max(axis=-1) < 0.08).mean() > 0.95


# ---------------------------------------------------------------------------
# live viewer (the reference's interactive GLUT loop, terminal edition)
# ---------------------------------------------------------------------------

def _tiny_viewer(tmp_path):
    from realtrace_tpu.apps import scenes
    from realtrace_tpu.apps.viewer import Viewer
    from realtrace_tpu.core.types import RenderConfig
    from realtrace_tpu.render.camera import InteractiveCamera
    import io

    scene, _ = scenes.sphere_plane_scene()
    orbit = InteractiveCamera(radius=85.0, pitch=0.78, resolution=(32, 16))
    cfg = RenderConfig(max_depth=1, accel="bruteforce")
    return Viewer(scene, orbit, cfg, out=io.StringIO(), save_dir=str(tmp_path))


def test_viewer_parse_events_keys_and_mouse():
    from realtrace_tpu.apps.viewer import parse_events

    ev, rest = parse_events("q\x1b[A\x1b[<0;10;5M\x1b[<32;14;7M\x1b[<0;14;7m")
    assert rest == ""
    assert ev[0] == ("key", "q")
    assert ev[1] == ("key", "up")
    assert ev[2] == ("mouse", "left", 10, 5, "press")
    assert ev[3] == ("mouse", "left", 14, 7, "drag")
    assert ev[4] == ("mouse", "left", 14, 7, "release")
    # incomplete escape is kept for the next read
    ev, rest = parse_events("\x1b[<0;3")
    assert ev == [] and rest == "\x1b[<0;3"


def test_viewer_orbit_keys_change_camera_and_rerender(tmp_path):
    v = _tiny_viewer(tmp_path)
    v.render()
    yaw0, img0 = v.orbit.yaw, v.last_img.copy()
    assert v.handle_input("\x1b[C")             # right arrow: yaw
    assert v.orbit.yaw != yaw0
    assert v.frames == 2                        # input triggered a re-render
    assert (v.last_img != img0).any()
    r0 = v.orbit.radius
    assert v.handle_input("z")
    assert v.orbit.radius < r0
    assert not v.handle_input("q")              # quit


def test_viewer_split_escape_sequences_carry_over(tmp_path):
    # escape sequences split across os.read chunks (or the one-char-at-a-time
    # scripted feed) must buffer, not drop (round-2 ADVICE finding)
    v = _tiny_viewer(tmp_path)
    v.render()
    yaw0 = v.orbit.yaw
    for ch in "\x1b[C":                          # right arrow, one byte per call
        assert v.handle_input(ch)
    assert v.orbit.yaw != yaw0
    # a lone ESC resolves to quit once the input goes idle (flush)
    assert v.handle_input("\x1b")
    assert not v.handle_input("", flush=True)


def test_viewer_batched_script_matches_per_frame(tmp_path):
    """run_script_batched (K frames per device dispatch, uint8 RGBA pull)
    must land on the same final camera and the same final image as the
    per-frame scripted loop."""
    import numpy as np

    script = "\x1b[C\x1b[C\x1b[A" + "z"          # yaw, yaw, pitch, radius
    a = _tiny_viewer(tmp_path)
    a.run_script(script)
    b = _tiny_viewer(tmp_path)
    b.run_script_batched(script, batch=3)        # 4 cams -> pad to 6
    assert (a.orbit.yaw, a.orbit.pitch, a.orbit.radius) == \
        (b.orbit.yaw, b.orbit.pitch, b.orbit.radius)
    assert b.frames == 4
    np.testing.assert_array_equal(a.last_img, b.last_img)


def test_viewer_batched_script_stops_on_quit(tmp_path):
    """A 'q' mid-script must stop COLLECTING (ADVICE r4: rebinding the
    iterated string was a no-op): keys after the quit apply no orbit motion
    and contribute no frames, matching run_script's early return."""
    script_pre = "\x1b[C\x1b[C"                  # 2 yaw steps
    a = _tiny_viewer(tmp_path)
    a.run_script_batched(script_pre, batch=2)
    b = _tiny_viewer(tmp_path)
    b.run_script_batched(script_pre + "q" + "\x1b[A\x1b[Azz", batch=2)
    assert b.frames == a.frames == 2             # nothing past the quit
    assert (a.orbit.yaw, a.orbit.pitch, a.orbit.radius) == \
        (b.orbit.yaw, b.orbit.pitch, b.orbit.radius)


def test_viewer_mouse_drag_orbits(tmp_path):
    v = _tiny_viewer(tmp_path)
    v.render()
    yaw0, pitch0 = v.orbit.yaw, v.orbit.pitch
    assert v.handle_input("\x1b[<0;10;5M\x1b[<32;20;9M\x1b[<0;20;9m")
    assert v.orbit.yaw != yaw0 and v.orbit.pitch != pitch0


def test_viewer_save_writes_png_and_status_has_fps(tmp_path):
    # save into a NOT-YET-EXISTING directory (regression: save() must mkdir)
    v = _tiny_viewer(tmp_path / "shots")
    v.render()
    assert v.handle_input("s")
    pngs = list((tmp_path / "shots").glob("*.png"))
    assert len(pngs) == 1
    img = load_png(pngs[0])
    assert img.shape == (16, 32, 3)
    assert "FPS" in v.status() and "Mrays" in v.status()


def test_viewer_ansi_frame_shapes():
    from realtrace_tpu.apps.viewer import ansi_frame

    img = np.zeros((4, 3, 3), np.uint8)
    img[0] = (255, 0, 0)
    s = ansi_frame(img, "hello")
    assert "hello" in s and s.count("▀") == 6    # 3 cols x 2 cell-rows
    assert "38;2;255;0;0" in s


def test_viewer_scripted_main(tmp_path, monkeypatch):
    from realtrace_tpu.apps.viewer import main as viewer_main

    monkeypatch.chdir(tmp_path)
    viewer_main(["--scene", "sphere", "--width", "32", "--height", "16",
                 "--depth", "1", "--cpu", "--accel", "bruteforce",
                 "--script", "\x1b[Czsq", "--save-dir", str(tmp_path)])
    assert list(tmp_path.glob("*.png"))
