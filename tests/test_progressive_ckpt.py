"""Progressive/resumable rendering + train-state checkpointing tests
(SURVEY §5 checkpoint/resume parity)."""
import jax.numpy as jnp
import numpy as np
import optax

from realtrace_tpu.apps import scenes
from realtrace_tpu.core.types import RenderConfig
from realtrace_tpu.diff import checkpoint as ckpt
from realtrace_tpu.diff.inverse import make_train_step
from realtrace_tpu.render.pipeline import render_buffer, render_image
from realtrace_tpu.render.progressive import ProgressiveRenderer

CFG = RenderConfig(max_depth=2)


def test_progressive_matches_full_render():
    scene, cam = scenes.sphere_plane_scene(dtype=jnp.float32)
    camera = scenes.make_camera(cam, 32, 32, dtype=jnp.float32)
    full = np.asarray(render_image(scene, camera, CFG))
    pr = ProgressiveRenderer(scene, camera, CFG, band=8)
    steps = 0
    while not pr.step():
        steps += 1
    assert steps + 1 == 4
    np.testing.assert_allclose(pr.image(), full, atol=1e-5)


def test_progressive_save_resume(tmp_path):
    scene, cam = scenes.sphere_plane_scene(dtype=jnp.float32)
    camera = scenes.make_camera(cam, 16, 16, dtype=jnp.float32)
    a = ProgressiveRenderer(scene, camera, CFG, band=4)
    a.step()
    a.step()
    a.save(tmp_path / "state.npz")
    b = ProgressiveRenderer(scene, camera, CFG, band=4)
    b.load(tmp_path / "state.npz")
    assert b.cursor == a.cursor == 8
    b.render_all()
    full = np.asarray(render_image(scene, camera, CFG))
    np.testing.assert_allclose(b.image(), full, atol=1e-5)


def test_train_state_checkpoint_roundtrip(tmp_path):
    scene, cam = scenes.sphere_plane_scene(dtype=jnp.float32)
    camera = scenes.make_camera(cam, 8, 8, dtype=jnp.float32)
    target = render_buffer(scene, camera, CFG)
    step, params, opt_state = make_train_step(
        scene, camera, CFG, target, optimizer=optax.adam(1e-2),
        fields=("sph_color",))
    params, opt_state, _ = step(params, opt_state)
    path = ckpt.save_train_state(tmp_path / "ckpt", 1, params, opt_state)
    got_step, got_params, got_opt = ckpt.restore_train_state(path, params, opt_state)
    assert got_step == 1
    np.testing.assert_allclose(np.asarray(got_params["sph_color"]),
                               np.asarray(params["sph_color"]), atol=1e-7)
    # restored state continues training
    p2, o2, loss = step(got_params, got_opt)
    assert np.isfinite(float(loss))
    assert ckpt.latest_checkpoint(tmp_path / "ckpt") is not None
