"""Acceleration-structure tests: the chunk sweep must agree with brute force
(the role the DDA grid plays vs the linear object scan in the reference,
Serial/world.cpp:5-17)."""
import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from realtrace_tpu.apps import scenes
from realtrace_tpu.core import vec
from realtrace_tpu.core.types import RenderConfig, SceneBuilder
from realtrace_tpu.ops import accel, intersect
from realtrace_tpu.render.pipeline import render_image

DT = jnp.float64


def random_tri_scene(n=257, seed=3):
    rng = np.random.default_rng(seed)
    b = SceneBuilder(dtype=DT)
    centers = rng.uniform(-10, 10, (n, 3))
    for ctr in centers:
        tri = ctr + rng.uniform(-0.8, 0.8, (3, 3))
        b.add_triangle(tri[0], tri[1], tri[2], color=tuple(rng.uniform(0, 1, 3)))
    b.add_light((0, 30, 30), (1, 1, 1))
    b.background = (0.1, 0.3, 0.6)
    b.ambient = (1, 1, 1)
    return b.build()


def random_rays(r=300, seed=11):
    rng = np.random.default_rng(seed)
    ro = jnp.asarray(rng.uniform(-15, 15, (r, 3)), DT)
    rd = vec.normalize(jnp.asarray(rng.standard_normal((r, 3)), DT))
    return ro, rd


def test_chunk_perm_is_permutation():
    scene = random_tri_scene(100)
    perm = accel.build_chunk_perm(scene.tri_vertices, 64)
    assert perm.shape[0] == 128  # padded to chunk multiple
    assert set(perm[:100].tolist()) | set(perm[100:].tolist()) <= set(range(100))
    assert len(set(perm.tolist())) == 100


def test_chunked_matches_bruteforce_closest():
    scene = random_tri_scene()
    cfg_b = RenderConfig(accel="bruteforce")
    cfg_c = dataclasses.replace(cfg_b, accel="chunked", chunk_size=32, shortlist=48, ray_block=64)
    scene_c = accel.with_chunks(scene, cfg_c)
    ro, rd = random_rays()
    tb, ib = accel.closest_triangle(scene_c, ro, rd, cfg_c), None
    t_ref, _, _ = intersect.triangle_test(ro, rd, scene.tri_vertices,
                                          cfg_b.det_epsilon, cfg_b.smallest_dist)
    t_best = jnp.min(t_ref, axis=1)
    np.testing.assert_allclose(np.asarray(tb[0]), np.asarray(t_best), atol=1e-9)


def test_chunked_golden_image_bob_matches_bruteforce(reference_assets):
    scene, cam = scenes.serial_obj_scene(reference_assets / "bob_tri.obj",
                                         dtype=DT, max_faces=2000)
    cfg_b = RenderConfig(accel="bruteforce", max_depth=2)
    cfg_c = dataclasses.replace(cfg_b, accel="chunked", chunk_size=64,
                                shortlist=31, ray_block=256)
    scene_c = accel.with_chunks(scene, cfg_c)
    camera = scenes.make_camera(cam, 48, 36, dtype=DT)
    img_b = np.asarray(render_image(scene, camera, cfg_b))
    img_c = np.asarray(render_image(scene_c, camera, cfg_c))
    err = np.abs(img_b - img_c).max(axis=-1)
    assert (err > 1e-6).mean() <= 0.002, f"max {err.max()}, frac {(err>1e-6).mean()}"


def test_any_hit_chunked_matches_bruteforce():
    scene = random_tri_scene(130, seed=5)
    cfg_c = RenderConfig(accel="chunked", chunk_size=32, shortlist=16, ray_block=128)
    scene_c = accel.with_chunks(scene, cfg_c)
    ro, rd = random_rays(200, seed=8)
    occ_c = accel.any_triangle(scene_c, ro, rd, cfg_c)
    t_ref, _, _ = intersect.triangle_test(ro, rd, scene.tri_vertices,
                                          cfg_c.det_epsilon, cfg_c.smallest_dist)
    occ_b = jnp.any(t_ref < intersect.BIG, axis=1)
    np.testing.assert_array_equal(np.asarray(occ_c), np.asarray(occ_b))
