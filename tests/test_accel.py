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


def test_device_perm_matches_host_perm():
    scene = random_tri_scene(100)
    host = accel.build_chunk_perm(scene.tri_vertices, 64)
    dev = np.asarray(accel.chunk_perm_device(scene.tri_vertices, 64))
    assert dev.shape == host.shape
    assert len(set(dev[:100].tolist())) == 100  # valid permutation
    cfg = RenderConfig(accel="chunked", chunk_size=64)
    v_host = float(accel.chunk_volume(scene.replace(tri_chunk_perm=jnp.asarray(host)), cfg))
    v_dev = float(accel.chunk_volume(scene.replace(tri_chunk_perm=jnp.asarray(dev)), cfg))
    np.testing.assert_allclose(v_dev, v_host, rtol=0.05)


def _chunk_surface_area(tv, perm, chunk_size):
    tvc = np.asarray(tv, np.float64)[np.asarray(perm)].reshape(-1, chunk_size, 3, 3)
    d = tvc.max(axis=(1, 2)) - tvc.min(axis=(1, 2))
    return float((d[:, 0] * d[:, 1] + d[:, 1] * d[:, 2] + d[:, 0] * d[:, 2]).sum())


def test_split_perm_valid_and_tighter_than_morton():
    """The median-split build must (a) be a valid padded permutation on both
    host and device, (b) agree host-vs-device on partition quality, and
    (c) produce tighter chunk AABBs than the Morton sort (the reason it is
    the default build)."""
    scene = random_tri_scene(500, seed=5)
    for c in (32, 64):
        host = accel.build_chunk_perm_split(scene.tri_vertices, c)
        dev = np.asarray(accel.chunk_perm_split_device(scene.tri_vertices, c))
        assert host.shape == dev.shape == ((500 + c - 1) // c * c,)
        # every original id present (padding duplicates may land anywhere in
        # the split order — duplicates give identical nearest hits)
        assert set(host.tolist()) == set(range(500))
        assert set(dev.tolist()) == set(range(500))
        a_host = _chunk_surface_area(scene.tri_vertices, host, c)
        a_dev = _chunk_surface_area(scene.tri_vertices, dev, c)
        np.testing.assert_allclose(a_dev, a_host, rtol=1e-3)
        a_morton = _chunk_surface_area(
            scene.tri_vertices, accel.build_chunk_perm(scene.tri_vertices, c), c)
        assert a_host < a_morton, (a_host, a_morton)


def test_split_perm_render_matches_bruteforce(reference_assets):
    """End-to-end: the default (split) build through the pallas path must
    reproduce the brute-force image (ordering never affects correctness)."""
    scene, cam = scenes.serial_obj_scene(reference_assets / "tetrahedron.obj",
                                         dtype=jnp.float32)
    cfg_b = RenderConfig(accel="bruteforce", max_depth=2)
    cfg_p = dataclasses.replace(cfg_b, accel="pallas", chunk_size=8)
    scene_p = accel.with_chunks(scene, cfg_p)   # default = split build
    camera = scenes.make_camera(cam, 32, 32, dtype=jnp.float32)
    img_b = np.asarray(render_image(scene, camera, cfg_b))
    img_p = np.asarray(render_image(scene_p, camera, cfg_p))
    err = np.abs(img_b - img_p).max(axis=-1)
    assert (err > 1e-3).mean() <= 0.01, f"max {err.max()}"


def test_on_device_resort_restores_tightness_and_exactness():
    """Moving geometry (inverse rendering of vertices) invalidates the Morton
    ordering; the on-device re-sort must restore chunk tightness while hits
    stay exact under ANY ordering (AABBs are recomputed per trace)."""
    import jax

    scene = random_tri_scene(256, seed=7)
    cfg = RenderConfig(accel="chunked", chunk_size=32, shortlist=8, ray_block=64)
    scene = accel.with_chunks(scene, cfg)
    v_fresh = float(accel.chunk_volume(scene, cfg))

    # scatter half the triangles far away: ordering now badly stale
    rng = np.random.default_rng(0)
    tv = np.array(scene.tri_vertices)
    sel = rng.permutation(256)[:128]
    tv[sel] += rng.uniform(-40, 40, (128, 1, 3))
    moved = scene.replace(tri_vertices=jnp.asarray(tv, DT))
    v_stale = float(accel.chunk_volume(moved, cfg))

    resorted = jax.jit(lambda s: accel.resort_chunks(s, cfg))(moved)
    v_resort = float(accel.chunk_volume(resorted, cfg))
    assert v_resort < 0.5 * v_stale, (v_fresh, v_stale, v_resort)

    # exactness is ordering-independent: stale and resorted agree with brute
    # force (chunked shortlist sized to cover all chunks here)
    cfg_all = dataclasses.replace(cfg, shortlist=256 // 32)
    ro, rd = random_rays(200, seed=2)
    t_ref, _, _ = intersect.triangle_test(ro, rd, moved.tri_vertices,
                                          cfg.det_epsilon, cfg.smallest_dist)
    t_best = np.asarray(jnp.min(t_ref, axis=1))
    for s in (moved, resorted):
        t, _ = accel.closest_triangle(s, ro, rd, cfg_all)
        np.testing.assert_allclose(np.asarray(t), t_best, atol=1e-9)


def test_train_step_resorts_chunks_on_device():
    """A vertex-optimizing train step with a chunked accel re-sorts inside jit
    (compiles and runs; the loss is finite and decreases over a few steps)."""
    from realtrace_tpu.diff.inverse import make_train_step
    from realtrace_tpu.render.camera import Camera

    scene = random_tri_scene(64, seed=9)
    cfg = RenderConfig(accel="chunked", chunk_size=16, shortlist=4,
                       ray_block=256, max_depth=1)
    scene = accel.with_chunks(scene, cfg)
    camera = Camera.make((0, 0, 30), (0, 0, 0), (0, 1, 0), 45.0, 16, 16, dtype=DT)
    target = jnp.zeros((16 * 16, 3), DT)
    step, params, opt_state = make_train_step(
        scene, camera, cfg, target, fields=("tri_vertices", "tri_colors"))
    losses = []
    for _ in range(3):
        params, opt_state, loss = step(params, opt_state)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] <= losses[0]


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


def test_effective_chunk_size_caps_chunk_count():
    """SMEM-safe auto-scaling (round-5): the pallas sweep's prefetched chunk
    lists overflow SMEM past ~2k chunks, so the chunk size doubles until the
    count fits accel.MAX_CHUNKS; small scenes keep the requested size."""
    from realtrace_tpu.core.types import RenderConfig
    from realtrace_tpu.ops import accel as A
    from realtrace_tpu.ops.pallas import trace as T

    cfg = RenderConfig(accel="pallas", chunk_size=64)
    assert A.effective_chunk_size(cfg, 21_376) == 64          # bob x2: as-is
    assert A.effective_chunk_size(cfg, 42_752) == 128         # bob x4 -> 334
    cs = A.effective_chunk_size(cfg, 170_000)                 # bob x16 class
    assert cs == A.MAX_CHUNK_SIZE == 256                      # size cap holds
    assert (4 * cs) % 128 == 0                                # resident align
    cfg32 = RenderConfig(accel="pallas", chunk_size=32)
    assert A.effective_chunk_size(cfg32, 10_688) == 32        # flagship bob
    # SMEM hard limit overrides the size cap for extreme counts
    huge = A.MAX_CHUNK_SIZE * A.MAX_CHUNKS + 1
    assert A.effective_chunk_size(cfg, huge) == 2 * A.MAX_CHUNK_SIZE
    # end-to-end: with_chunks + build_pack agree on the scaled size and the
    # sweep still matches brute force
    scene = random_tri_scene(200, seed=11)
    saved = A.MAX_CHUNKS
    try:
        A.MAX_CHUNKS = 2         # force scaling on a small scene: 200 > 32*2
        scene = A.with_chunks(scene, RenderConfig(accel="pallas", chunk_size=32))
        pack = T.build_pack(scene, RenderConfig(accel="pallas", chunk_size=32))
        assert pack.chunk_size == 128 and pack.lo.shape[0] == 2
        ro, rd = random_rays(64, seed=3)
        cfgp = RenderConfig(accel="pallas", chunk_size=32)
        t_p, idx_p = T.closest_triangle(scene, ro, rd, cfgp)
    finally:
        A.MAX_CHUNKS = saved
    from realtrace_tpu.ops import intersect as I
    t_b, _, _ = I.triangle_test(ro, rd, scene.tri_vertices,
                                cfgp.det_epsilon, cfgp.smallest_dist)
    t_ref = jnp.min(t_b, axis=1)
    hit = np.asarray(t_ref) < I.BIG
    np.testing.assert_allclose(np.asarray(t_p)[hit], np.asarray(t_ref)[hit],
                               rtol=1e-5)
