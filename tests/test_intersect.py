"""Intersection kernel unit tests vs closed-form cases (SURVEY §4: the test
pyramid the reference lacks, layer L1/L2)."""
import jax.numpy as jnp
import numpy as np

from realtrace_tpu.core.types import RenderConfig, SceneBuilder
from realtrace_tpu.ops import intersect as isect

CFG = RenderConfig()
DT = jnp.float64


def _rays(o, d):
    o = jnp.asarray(o, DT).reshape(-1, 3)
    d = jnp.asarray(d, DT).reshape(-1, 3)
    # rays are normalized at construction (Serial/ray.h:28-31)
    from realtrace_tpu.core import vec
    return o, vec.normalize(d)


def test_triangle_hit_miss_and_t():
    tv = jnp.asarray([[[0, 0, 0], [2, 0, 0], [0, 2, 0]]], DT)
    ro, rd = _rays([[0.5, 0.5, -3], [5, 5, -3]], [[0, 0, 1], [0, 0, 1]])
    t, beta, gamma = isect.triangle_test(ro, rd, tv, CFG.det_epsilon, CFG.smallest_dist)
    np.testing.assert_allclose(t[0, 0], 3.0, atol=1e-12)
    assert t[1, 0] >= isect.BIG  # outside barycentric region


def test_triangle_edge_exclusive():
    # reference accept is strict: beta>0, gamma>0, beta+gamma<1 (Serial/triangle.cpp:18)
    tv = jnp.asarray([[[0, 0, 0], [2, 0, 0], [0, 2, 0]]], DT)
    ro, rd = _rays([[0.0, 0.5, -3]], [[0, 0, 1]])  # on the beta=0 edge
    t, *_ = isect.triangle_test(ro, rd, tv, CFG.det_epsilon, CFG.smallest_dist)
    assert t[0, 0] >= isect.BIG


def test_triangle_behind_origin_rejected():
    tv = jnp.asarray([[[0, 0, 0], [2, 0, 0], [0, 2, 0]]], DT)
    ro, rd = _rays([[0.5, 0.5, 3]], [[0, 0, 1]])  # triangle behind the ray
    t, *_ = isect.triangle_test(ro, rd, tv, CFG.det_epsilon, CFG.smallest_dist)
    assert t[0, 0] >= isect.BIG


def test_sphere_both_roots_and_inside():
    c = jnp.asarray([[0, 0, 0]], DT)
    r = jnp.asarray([1.0], DT)
    ro, rd = _rays([[0, 0, -3], [0, 0, 0]], [[0, 0, 1], [0, 0, 1]])
    t = isect.sphere_test(ro, rd, c, r, CFG.smallest_dist)
    np.testing.assert_allclose(t[0, 0], 2.0, atol=1e-12)   # nearest root
    np.testing.assert_allclose(t[1, 0], 1.0, atol=1e-12)   # inside: far root


def test_quad_two_triangle_halves():
    corners = jnp.asarray([[[1, 0, 1], [-1, 0, 1], [-1, 0, -1], [1, 0, -1]]], DT)
    # note: points on the p1-p3 diagonal are excluded by the strict
    # barycentric inequalities (both halves reject) — pick off-diagonal points
    ro, rd = _rays([[0.2, 2, 0.7], [-0.5, 2, -0.2], [3, 2, 3]],
                   [[0, -1, 0], [0, -1, 0], [0, -1, 0]])
    t = isect.quad_test(ro, rd, corners, CFG.det_epsilon, CFG.smallest_dist)
    np.testing.assert_allclose(t[0, 0], 2.0, atol=1e-12)
    np.testing.assert_allclose(t[1, 0], 2.0, atol=1e-12)
    assert t[2, 0] >= isect.BIG


def test_cylinder_nearest_positive_root():
    c = jnp.asarray([[0, 0, 0]], DT)
    up = jnp.asarray([[0, 1, 0]], DT)
    r = jnp.asarray([1.0], DT)
    ro, rd = _rays([[-3, 0, 0], [0, 0, 0]], [[1, 0, 0], [1, 0, 0]])
    t = isect.cylinder_test(ro, rd, c, up, r, CFG.smallest_dist)
    np.testing.assert_allclose(t[0, 0], 2.0, atol=1e-12)
    np.testing.assert_allclose(t[1, 0], 1.0, atol=1e-12)   # inside → larger root
    # parallel to axis: degenerate quadratic must not hit / NaN
    ro2, rd2 = _rays([[0.5, -5, 0]], [[0, 1, 0]])
    t2 = isect.cylinder_test(ro2, rd2, c, up, r, CFG.smallest_dist)
    assert np.isfinite(float(t2[0, 0]))
    assert t2[0, 0] >= isect.BIG


def _two_sphere_scene():
    b = SceneBuilder(dtype=DT)
    b.add_sphere((0, 0, 5), 1.0, color=(1, 0, 0))
    b.add_sphere((0, 0, 10), 1.0, color=(0, 1, 0))
    b.add_light((0, 10, 0), (1, 1, 1))
    return b.build()


def test_closest_hit_picks_nearest_family_member():
    scene = _two_sphere_scene()
    ro, rd = _rays([[0, 0, 0]], [[0, 0, 1]])
    hit = isect.closest_hit(scene, ro, rd, CFG)
    assert bool(hit.valid[0])
    np.testing.assert_allclose(hit.t[0], 4.0, atol=1e-12)
    np.testing.assert_allclose(hit.color[0], [1, 0, 0], atol=1e-12)
    np.testing.assert_allclose(hit.normal[0], [0, 0, -1], atol=1e-12)


def test_closest_hit_across_families():
    b = SceneBuilder(dtype=DT)
    b.add_sphere((0, 0, 6), 1.0, color=(1, 0, 0))
    b.add_triangle((-1, -1, 3), (1, -1, 3), (0, 2, 3), color=(0, 0, 1))
    b.add_light((0, 10, 0), (1, 1, 1))
    scene = b.build()
    ro, rd = _rays([[0, 0, 0]], [[0, 0, 1]])
    hit = isect.closest_hit(scene, ro, rd, CFG)
    np.testing.assert_allclose(hit.t[0], 3.0, atol=1e-12)
    assert int(hit.family[0]) == isect.FAM_TRI


def test_any_hit_occlusion():
    scene = _two_sphere_scene()
    ro, rd = _rays([[0, 0, 0], [0, 5, 0]], [[0, 0, 1], [0, 0, 1]])
    occ = isect.any_hit(scene, ro, rd, CFG)
    assert bool(occ[0]) and not bool(occ[1])


def test_smallest_dist_epsilon_rejects_self_hit():
    # ray starting exactly on a sphere surface must not re-hit it at t≈0
    scene = _two_sphere_scene()
    ro, rd = _rays([[0, 0, 4.0]], [[0, 0, -1]])
    hit = isect.closest_hit(scene, ro, rd, CFG)
    assert not bool(hit.valid[0])
