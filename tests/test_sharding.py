"""Multi-chip tests on the emulated 8-device CPU mesh
(--xla_force_host_platform_device_count=8, see conftest)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from realtrace_tpu.apps import scenes
from realtrace_tpu.core.types import RenderConfig
from realtrace_tpu.diff.inverse import make_train_step
from realtrace_tpu.parallel import mesh as pmesh
from realtrace_tpu.render.pipeline import render_image

DT = jnp.float64
CFG = RenderConfig(max_depth=2)


@pytest.fixture(scope="module")
def mesh8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 emulated devices")
    return pmesh.make_mesh(8)


def test_mesh_shape(mesh8):
    assert mesh8.shape["ty"] * mesh8.shape["tx"] == 8


def test_sharded_render_matches_single_device(mesh8):
    scene, cam = scenes.sphere_plane_scene(dtype=DT)
    camera = scenes.make_camera(cam, 32, 32, dtype=DT)
    want = np.asarray(render_image(scene, camera, CFG))
    got = np.asarray(pmesh.sharded_render(scene, camera, CFG, mesh8))
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_sharded_render_rejects_indivisible_image(mesh8):
    scene, cam = scenes.sphere_plane_scene(dtype=DT)
    camera = scenes.make_camera(cam, 30, 31, dtype=DT)
    with pytest.raises(ValueError):
        pmesh.sharded_render(scene, camera, CFG, mesh8)


def test_sharded_train_step_loss_decreases(mesh8):
    # (exact sharded-vs-single-device gradient equivalence is pinned by
    # test_sharded_grads_equal_single_device_grads below; this checks the
    # full optimizer step wiring end-to-end)
    scene, cam = scenes.sphere_plane_scene(dtype=DT)
    camera = scenes.make_camera(cam, 16, 16, dtype=DT)
    target = np.asarray(render_image(scene, camera, CFG), np.float64)
    wrong = scene.replace(sph_color=jnp.asarray([[0.3, 0.5, 0.7]], DT))

    s_step, s_params, s_opt = pmesh.make_sharded_train_step(
        wrong, camera, CFG, jnp.asarray(target), mesh8, fields=("sph_color",))
    # single-device reference step on the *unclamped buffer* — compare loss
    # directionality and gradient path rather than exact loss value
    p1, o1, loss1 = s_step(s_params, s_opt)
    p2, o2, loss2 = s_step(p1, o1)
    assert float(loss2) < float(loss1)
    assert np.all(np.isfinite(np.asarray(p2["sph_color"])))


def test_sharded_grads_equal_single_device_grads(mesh8):
    scene, cam = scenes.sphere_plane_scene(dtype=DT)
    camera = scenes.make_camera(cam, 16, 16, dtype=DT)
    from realtrace_tpu.diff.inverse import render_loss, scene_params
    target = jnp.zeros((16 * 16, 3), DT)
    params = scene_params(scene, ("sph_color", "lights"))
    g_single = jax.grad(render_loss)(params, scene, camera, CFG,
                                     target, False)

    # sharded grad via the train step's direct loss_and_grad export
    # (sum-of-squares/denominator matches mean over the flat buffer)
    step, p0, o0 = pmesh.make_sharded_train_step(
        scene, camera, CFG, target.reshape(16, 16, 3)[::-1], mesh8,
        fields=("sph_color", "lights"))
    _, g_sharded = step.loss_and_grad(p0)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-10),
        g_single, g_sharded)


def test_sharded_flythrough_matches_single_device(mesh8):
    # BASELINE config 5: animated interactive-camera sweep driving the
    # SHARDED render path (pixel tiles over the mesh) — every frame must
    # match the single-device flythrough bit-for-bit
    from realtrace_tpu.apps.flythrough import run_flythrough
    from realtrace_tpu.render.camera import InteractiveCamera

    scene, _ = scenes.sphere_plane_scene(dtype=DT)

    def cam():
        return InteractiveCamera(radius=85.0, pitch=0.6, resolution=(32, 16))

    imgs_s, _ = run_flythrough(scene, cam(), CFG, frames=3, mesh=mesh8, dtype=DT)
    imgs_1, _ = run_flythrough(scene, cam(), CFG, frames=3, dtype=DT)
    assert len(imgs_s) == 3
    for a, b in zip(imgs_s, imgs_1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-12)


def test_replicate_scene(mesh8):
    scene, _ = scenes.sphere_plane_scene(dtype=DT)
    rep = pmesh.replicate_scene(scene, mesh8)
    assert np.allclose(np.asarray(rep.sph_center), np.asarray(scene.sph_center))


def test_bench_scaling_smoke(monkeypatch, capsys):
    """CI smoke of benchmarks/bench_scaling.py (VERDICT r4 #6): the weak-
    scaling curve script runs end-to-end on the emulated mesh and emits
    per-point JSON with efficiency fractions."""
    import importlib
    import json as _json
    import sys as _sys
    from pathlib import Path

    monkeypatch.setenv("RT_SCALE_DEVICES", "2")
    monkeypatch.setenv("RT_SCALE_FLYTHROUGH", "0")
    monkeypatch.setenv("RT_BENCH_WIDTH", "128")
    monkeypatch.setenv("RT_BENCH_TILEH", "32")
    monkeypatch.setenv("RT_BENCH_DEPTH", "1")
    _sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "benchmarks"))
    try:
        mod = importlib.import_module("bench_scaling")
        mod.main()
    finally:
        _sys.path.pop(0)
    lines = [l for l in capsys.readouterr().out.splitlines() if l.startswith("{")]
    recs = [_json.loads(l) for l in lines]
    assert any("weak-scaling point 2 devices" in r["metric"] for r in recs)
    eff = [r for r in recs if "weak-scaling efficiency" in r["metric"]]
    assert eff and 0.0 < eff[0]["value"] <= 1.0
