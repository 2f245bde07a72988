"""Determinism: same scene + camera ⇒ bit-identical image (SURVEY §5 race
detection parity — XLA is race-free by construction; the reference designs
races out with atomicAdd + level barriers, here it's structural)."""
import numpy as np

import jax.numpy as jnp

from realtrace_tpu.apps import scenes
from realtrace_tpu.core.types import RenderConfig
from realtrace_tpu.render.pipeline import render_image


def test_render_bit_identical_across_runs():
    scene, cam = scenes.sphere_plane_scene(dtype=jnp.float32)
    camera = scenes.make_camera(cam, 32, 32, dtype=jnp.float32)
    cfg = RenderConfig(max_depth=3)
    a = np.asarray(render_image(scene, camera, cfg))
    b = np.asarray(render_image(scene, camera, cfg))
    np.testing.assert_array_equal(a, b)


def test_pallas_and_chunked_agree_on_occlusion(reference_assets):
    """any-mode pallas sweep vs chunked/bruteforce occlusion."""
    import dataclasses

    from realtrace_tpu.core import vec
    from realtrace_tpu.ops import accel
    from realtrace_tpu.ops.intersect import BIG, triangle_test
    from realtrace_tpu.ops.pallas import trace

    rng = np.random.default_rng(4)
    scene, _ = scenes.serial_obj_scene(reference_assets / "tetrahedron.obj",
                                       dtype=jnp.float32)
    cfg = RenderConfig(accel="pallas", chunk_size=8)
    scene = accel.with_chunks(scene, cfg)
    ro = jnp.asarray(rng.uniform(-60, 60, (300, 3)), jnp.float32)
    rd = vec.normalize(jnp.asarray(rng.standard_normal((300, 3)), jnp.float32))
    occ_p = np.asarray(trace.any_triangle(scene, ro, rd, cfg))
    t, _, _ = triangle_test(ro, rd, scene.tri_vertices, cfg.det_epsilon, cfg.smallest_dist)
    occ_b = np.asarray(jnp.any(t < BIG, axis=1))
    np.testing.assert_array_equal(occ_p, occ_b)
