"""Branching (dielectric) wavefront capacity behavior.

`render/shade._compact_children` folds a level's 2K (reflect ‖ refract)
candidate children into K lanes. Ordinary Whitted scenes never fill the
capacity (most lanes are non-dielectric or dead); a frame where >50% of
lanes keep spawning TWO live children overflows it, and the tail is dropped
by design. These tests pin both regimes:

  * no-overflow: the bundled dielectric scene reports 0 dropped coefficient
    mass (so golden tests on it are exact by construction);
  * overflow: a glass-sandwich scene that provably overflows — the dropped
    mass is reported, and the image error vs the oracle's full binary
    recursion is bounded by that mass (scaled by the scene's radiance bound).

Ref semantics being approximated: the serial shader's unbounded binary
recursion (Serial/world.cpp:77-109).
"""
import jax.numpy as jnp
import numpy as np

from oracle.cpu_reference import OracleRenderer
from realtrace_tpu.apps import scenes
from realtrace_tpu.core.types import RenderConfig, SceneBuilder
from realtrace_tpu.render.camera import Camera
from realtrace_tpu.render.shade import trace_wavefront

DT = jnp.float64


def _trace_with_stats(scene, cam_dict, cfg, w, h):
    cam = scenes.make_camera(cam_dict, w, h, dtype=DT)
    rd = cam.ray_directions()
    ro = jnp.broadcast_to(cam.position, rd.shape)
    stats: dict = {}
    color = trace_wavefront(scene, ro, rd, cfg, branching=True,
                            debug_stats=stats)
    img = jnp.clip(color.reshape(h, w, 3)[::-1], 0.0, 1.0)
    return np.asarray(img), float(stats["dropped_children_coeff"])


def test_has_dielectrics_is_jit_safe_for_built_scenes():
    """Scenes from SceneBuilder.build() carry the branching mode as STATIC
    aux data, so ``branching=None`` resolution works on a TRACED Scene —
    the round-3 footgun (np.asarray of traced leaves inside jit) is gone."""
    import jax

    from realtrace_tpu.render.pipeline import render_image

    for make, expect in ((scenes.full_primitive_scene, True),
                         (scenes.sphere_plane_scene, False)):
        scene, cam = make(dtype=DT)
        assert scene.dielectric is expect
        camera = scenes.make_camera(cam, 16, 8, dtype=DT)

        @jax.jit
        def frame(s, c):
            # no branching= passed: resolved from the traced Scene's flag
            return render_image(s, c, RenderConfig(max_depth=2))

        eager = render_image(scene, camera, RenderConfig(max_depth=2),
                             branching=expect)
        np.testing.assert_allclose(np.asarray(frame(scene, camera)),
                                   np.asarray(eager), rtol=1e-12, atol=1e-12)


def test_replace_of_materials_clears_stale_dielectric_flag():
    """A post-build material mutation must not keep the stale static answer
    (ADVICE r4): replace() of a *_materials field clears the flag to None so
    has_dielectrics() re-inspects the actual leaves; an explicit
    ``dielectric=`` in the same replace() wins."""
    import dataclasses as dc

    scene, _ = scenes.sphere_plane_scene(dtype=DT)
    assert scene.dielectric is False and not scene.has_dielectrics()
    glassy = dc.replace(scene.sph_materials,
                        kr=jnp.full_like(scene.sph_materials.kr, 0.3),
                        kt=jnp.full_like(scene.sph_materials.kt, 0.8))
    mutated = scene.replace(sph_materials=glassy)
    assert mutated.dielectric is None
    assert mutated.has_dielectrics()          # true answer from the leaves
    explicit = scene.replace(sph_materials=glassy, dielectric=True)
    assert explicit.dielectric is True
    # non-material replaces keep the static flag (jit-safety preserved)
    moved = scene.replace(sph_center=scene.sph_center + 1.0)
    assert moved.dielectric is False


def test_render_config_validates_precisions():
    import pytest

    from realtrace_tpu.core.types import RenderConfig as RC
    with pytest.raises(ValueError, match="occlusion_precision"):
        RC(occlusion_precision="high")
    with pytest.raises(ValueError, match="matmul_precision"):
        RC(matmul_precision="bf16")
    with pytest.raises(ValueError, match="accel"):
        RC(accel="kd-tree")
    RC(occlusion_precision="highest", matmul_precision="highest",
       accel="pallas")                        # supported combos construct


def test_ordinary_dielectric_scene_has_no_overflow():
    scene, cam = scenes.full_primitive_scene(dtype=DT)
    assert scene.has_dielectrics()
    _, dropped = _trace_with_stats(scene, cam, RenderConfig(max_depth=3),
                                   64, 32)
    assert dropped == 0.0


def _glass_shells_scene():
    """Camera at the center of two CONCENTRIC glass spheres: every ray in
    every direction hits glass, so at each level BOTH the reflect and the
    refract child stay live — 4W live candidates into the 2W lane capacity
    (verified: 512 live children of 256 lanes at level 1 for a 128-ray
    frame), the guaranteed-overflow framing."""
    b = SceneBuilder(dtype=DT)
    b.ambient = (1.0, 1.0, 1.0)
    b.background = (0.1, 0.3, 0.6)
    glass = b.material(ka=0.1, kd=0.3, ks=0.2, kr=0.5, kt=0.8, eta=1.5)
    b.add_sphere((0.0, 0.0, 0.0), 10.0, color=(0.9, 0.9, 1.0), material=glass)
    b.add_sphere((0.0, 0.0, 0.0), 25.0, color=(1.0, 0.9, 0.9), material=glass)
    b.add_light((0, 5, 0), (0.5, 1.0, 1.0))
    cam = dict(position=(0, 0, 0), target=(0, 0, 1), up=(0, 1, 0), fovy=40.0)
    return b.build(), cam


def test_overflow_reports_dropped_mass_and_bounds_image_error():
    scene, cam = _glass_shells_scene()
    cfg = RenderConfig(max_depth=3)
    w, h = 64, 32
    img, dropped = _trace_with_stats(scene, cam, cfg, w, h)
    assert dropped > 0.0, "scene was built to overflow the child capacity"

    want = OracleRenderer(scene, cfg).render(scenes.make_camera(cam, w, h, dtype=DT))
    err_sum = float(np.abs(img - np.asarray(want)).sum())
    # every dropped child's whole subtree contributes at most its coefficient
    # times the scene radiance bound per channel; 4.0 is a loose bound for
    # this scene's intensities (<= 1) + ambient + phong terms
    assert err_sum <= 4.0 * dropped, (err_sum, dropped)
    # drops must stay a small fraction of the frame (capacity is 2x width)
    assert err_sum / (3 * w * h) < 0.05
