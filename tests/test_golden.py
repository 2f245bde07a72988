"""Golden-image tests: the TPU wavefront renderer vs the NumPy transliteration
of the serial recursive shader (SURVEY §4: cross-implementation check — the
same role Serial plays for the CUDA stack in the reference).

Run in float64 on CPU so the only differences are reduction order and decision
boundaries; a tiny fraction of boundary pixels may legitimately disagree.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from oracle.cpu_reference import OracleRenderer
from realtrace_tpu.apps import scenes
from realtrace_tpu.core.types import RenderConfig, SceneBuilder
from realtrace_tpu.render.pipeline import render_image

DT = jnp.float64


def assert_images_match(got, want, tol=1e-6, max_bad_frac=0.002):
    got = np.asarray(got, np.float64)
    err = np.abs(got - want).max(axis=-1)
    bad = err > tol
    frac = bad.mean()
    assert frac <= max_bad_frac, (
        f"{bad.sum()} / {bad.size} pixels differ by >{tol} "
        f"(max err {err.max():.3e}, frac {frac:.4f})")


def run_case(scene, cam_dict, cfg, w, h):
    cam = scenes.make_camera(cam_dict, w, h, dtype=DT)
    img = render_image(scene, cam, cfg)
    want = OracleRenderer(scene, cfg).render(cam)
    assert_images_match(img, want)


def test_sphere_plane_depth1():
    """BASELINE config 1: sphere + plane + point light, depth-1 Whitted."""
    scene, cam = scenes.sphere_plane_scene(dtype=DT)
    run_case(scene, cam, RenderConfig(max_depth=1), 64, 48)


def test_sphere_plane_depth3_reflections():
    scene, cam = scenes.sphere_plane_scene(dtype=DT)
    run_case(scene, cam, RenderConfig(max_depth=3), 48, 48)


def test_full_primitives_with_dielectric():
    """All four families incl. a dielectric cylinder → branching wavefront."""
    scene, cam = scenes.full_primitive_scene(dtype=DT)
    assert scene.has_dielectrics()
    run_case(scene, cam, RenderConfig(max_depth=3), 48, 32)


def test_no_shadow_mode():
    scene, cam = scenes.sphere_plane_scene(dtype=DT)
    run_case(scene, cam, RenderConfig(max_depth=2, shadows=False), 32, 32)


def test_fixed_diffuse_mode():
    """Non-legacy diffuse (surface→light direction) must also match."""
    scene, cam = scenes.sphere_plane_scene(dtype=DT)
    run_case(scene, cam, RenderConfig(max_depth=1, legacy_diffuse=False), 32, 32)


def test_tetrahedron_obj(reference_assets):
    """BASELINE config 2: tetrahedron.obj mesh, shadow rays (small res)."""
    scene, cam = scenes.serial_obj_scene(reference_assets / "tetrahedron.obj", dtype=DT)
    assert scene.n_triangles == 14
    run_case(scene, cam, RenderConfig(max_depth=3), 48, 48)


def test_deep_recursion_background_termination():
    """Mirror-box: rays that never die must pick up background at depth cap."""
    b = SceneBuilder(dtype=DT)
    b.background = (0.1, 0.3, 0.6)
    b.ambient = (1.0, 1.0, 1.0)
    mirror = b.material(ka=0.1, kd=0.1, ks=0.1, kr=0.9)
    b.add_plane((20, -2, 20), (-20, -2, 20), (-20, -2, -20), (20, -2, -20),
                color=(0.9, 0.9, 0.9), material=mirror)
    b.add_plane((20, 8, 20), (20, 8, -20), (-20, 8, -20), (-20, 8, 20),
                color=(0.9, 0.9, 0.9), material=mirror)
    b.add_light((0, 3, 0), (1, 1, 1))
    scene = b.build()
    cam = dict(position=(0, 3, 18), target=(0, 2, 0), up=(0, 1, 0), fovy=45)
    run_case(scene, cam, RenderConfig(max_depth=10), 24, 24)


def test_bob_textured_with_accel(reference_assets):
    """BASELINE config 3 (scaled down): bob + texture, chunk accel, depth-2.
    Exercises the OBJ/texture pipeline + acceleration + wavefront against the
    recursive oracle in one go."""
    import dataclasses

    from realtrace_tpu.ops import accel

    cfg = RenderConfig(max_depth=2, accel="chunked", chunk_size=64,
                       shortlist=32, ray_block=256)
    scene, cam = scenes.serial_obj_scene(
        reference_assets / "bob_tri.obj",
        texture_path=reference_assets / "bob_diffuse.png",
        dtype=DT, max_faces=2000)
    scene = accel.with_chunks(scene, cfg)
    run_case(scene, cam, cfg, 40, 30)


def test_two_lights_with_shadows():
    """Multi-light: the serial shader sums Phong over the light list and
    shadows if ANY light is occluded (Serial/world.cpp:44-58)."""
    b = SceneBuilder(dtype=DT)
    b.ambient = (1, 1, 1)
    b.background = (0.1, 0.3, 0.6)
    b.add_sphere((0, 0, 0), 2.0, color=(0.8, 0.1, 0.0),
                 material=b.material(kr=0.2))
    b.add_plane((12, -3, 12), (-12, -3, 12), (-12, -3, -12), (12, -3, -12),
                color=(0.5, 0.5, 0.5), material=b.material(ka=0.1, kd=0.9, ks=0.2))
    b.add_light((8, 10, 8), (0.7, 0.2, 0.2))
    b.add_light((-8, 10, -2), (0.2, 0.7, 0.7))
    scene = b.build()
    cam = dict(position=(10, 8, 10), target=(0, 0, 0), up=(0, 1, 0), fovy=45)
    run_case(scene, cam, RenderConfig(max_depth=2), 40, 32)


def test_parallel_stack_scene_semantics(reference_assets):
    """The CUDA app's scene (duplicated model, floor tris, no shadow rays —
    Parellel/main.cu:140-244, kernel.cu has no shadow path)."""
    scene, cam = scenes.parallel_obj_scene(reference_assets / "tetrahedron.obj",
                                           dtype=DT, scale=2.0)
    assert scene.n_triangles == 2 * 14 + 2  # duplicated mesh + floor
    run_case(scene, cam, RenderConfig(max_depth=2, shadows=False), 40, 30)


def test_golden_128_cached():
    """>=128^2 golden vs a committed oracle artifact (tests/oracle/golden128.npz,
    regenerate with tests/oracle/gen128.py). Sixteen 32x32 wavefront tiles +
    reflective minority: catches tile-boundary and inter-level-compaction bugs
    the 24-48 px oracle comparisons cannot see."""
    import pathlib

    from oracle.scene128 import CAM, SIZE, build_scene128, config

    art = pathlib.Path(__file__).parent / "oracle" / "golden128.npz"
    assert art.exists(), "run tests/oracle/gen128.py to regenerate the artifact"
    want = np.load(art)["image"]
    scene = build_scene128(dtype=DT)
    cam = scenes.make_camera(CAM, SIZE, SIZE, dtype=DT)
    got = render_image(scene, cam, config())
    assert_images_match(got, want)


@pytest.mark.parametrize("knobs", [
    {},                                  # flagship defaults
    {"exact_mask_secondary": True},      # forced exact per-ray chunk masks
    {"merge_queries": False},            # unmerged per-level query fallback
], ids=["default", "exact_secondary", "unmerged"])
def test_golden_128_cached_pallas(knobs):
    """Same artifact through the flagship pallas accel path (interpret mode on
    CPU) — pins the chunk-sweep kernel + compaction at a tile-spanning size.
    Parametrized over every reachable non-default cfg branch in render/shade
    (VERDICT round-3: measured-off knobs must be tested or deleted)."""
    import pathlib

    from oracle.scene128 import CAM, SIZE, build_scene128, config
    from realtrace_tpu.ops import accel

    art = pathlib.Path(__file__).parent / "oracle" / "golden128.npz"
    assert art.exists(), "run tests/oracle/gen128.py to regenerate the artifact"
    want = np.load(art)["image"]
    cfg = config(accel="pallas", **knobs)
    scene = accel.with_chunks(build_scene128(dtype=DT), cfg)
    cam = scenes.make_camera(CAM, SIZE, SIZE, dtype=DT)
    got = render_image(scene, cam, cfg)
    assert_images_match(got, want)
