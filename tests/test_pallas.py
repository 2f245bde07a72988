"""Pallas chunk-sweep kernel tests (interpret mode on CPU; the compiled path
is exercised on TPU by bench.py and the TPU smoke script)."""
import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from realtrace_tpu.apps import scenes
from realtrace_tpu.core import vec
from realtrace_tpu.core.types import RenderConfig, SceneBuilder
from realtrace_tpu.ops import accel, intersect
from realtrace_tpu.ops.pallas import trace
from realtrace_tpu.render.pipeline import render_image


def random_scene(n=137, spread=3.0, seed=3):
    rng = np.random.default_rng(seed)
    b = SceneBuilder(dtype=jnp.float32)
    for ctr in rng.uniform(-10, 10, (n, 3)):
        tri = ctr + rng.uniform(-spread, spread, (3, 3))
        b.add_triangle(tri[0], tri[1], tri[2])
    b.add_light((0, 30, 30), (1, 1, 1))
    b.ambient = (1, 1, 1)
    b.background = (0.1, 0.3, 0.6)
    return b.build()


def random_rays(r=500, seed=11):
    rng = np.random.default_rng(seed)
    ro = jnp.asarray(rng.uniform(-15, 15, (r, 3)), jnp.float32)
    rd = vec.normalize(jnp.asarray(rng.standard_normal((r, 3)), jnp.float32))
    return ro, rd


def brute(scene, ro, rd, cfg):
    t, _, _ = intersect.triangle_test(ro, rd, scene.tri_vertices,
                                      cfg.det_epsilon, cfg.smallest_dist)
    tb = jnp.min(t, axis=1)
    ib = jnp.where(tb < intersect.BIG, jnp.argmin(t, axis=1), -1)
    return np.asarray(tb), np.asarray(ib)


def test_pack_tri_consts_reproduces_cramer():
    """The linear-form constants must reproduce det/t/beta/gamma exactly."""
    rng = np.random.default_rng(0)
    # stacked large triangles on z=k planes so hits are guaranteed
    tv = jnp.asarray([[[[-10, -10, k + 1.0], [10, -10, k + 1.0], [0, 10, k + 1.0]]
                       for k in range(8)]], jnp.float32)
    g = jnp.asarray(np.asarray(tv).reshape(-1, 3).mean(0))[None] + 7.0
    b = trace._pack_tri_consts(tv, g)
    assert b.shape == (1, 32, trace.FEAT)
    ro = jnp.asarray(rng.uniform(-2, 2, (16, 3)) * np.array([1, 1, 0]), jnp.float32)
    rd = vec.normalize(jnp.asarray(rng.standard_normal((16, 3))
                                   + np.array([0, 0, 4]), jnp.float32))
    a = trace._features(ro, rd)   # (FEAT, R) transposed layout
    gx, gy, gz = g[0]
    rdx, rdy, rdz = a[4:5], a[5:6], a[6:7]
    a2 = jnp.concatenate([
        a[0:1], a[1:2] - gx, a[2:3] - gy, a[3:4] - gz, a[4:7],
        a[7:8] - (rdy * gz - rdz * gy), a[8:9] - (rdz * gx - rdx * gz),
        a[9:10] - (rdx * gy - rdy * gx), a[10:trace.FEAT]], axis=0)
    p = b[0] @ a2
    det, tnum = p[0:8], p[8:16]
    t = (tnum / det).T
    tt, _, _ = intersect.triangle_test(ro, rd, tv.reshape(8, 3, 3), 1e-7, 1e-4)
    mask = np.asarray(tt) < 1e29
    assert mask.sum() > 0
    np.testing.assert_allclose(np.asarray(t)[mask], np.asarray(tt)[mask],
                               rtol=1e-4, atol=1e-4)


def test_pallas_matches_bruteforce_interpret():
    scene = random_scene()
    cfg = RenderConfig(accel="pallas", chunk_size=32)
    scene = accel.with_chunks(scene, cfg)
    ro, rd = random_rays()
    tp, ip = trace.closest_triangle(scene, ro, rd, cfg)
    tp, ip = np.asarray(tp), np.asarray(ip)
    tb, ib = brute(scene, ro, rd, cfg)
    hit_p, hit_b = tp < 1e29, tb < 1e29
    np.testing.assert_array_equal(hit_p, hit_b)
    both = hit_p & hit_b
    np.testing.assert_allclose(tp[both], tb[both], rtol=1e-4)
    assert (ip[both] == ib[both]).mean() > 0.99  # ties may differ


def test_any_pack_occlusion_matches_bruteforce():
    """pack.any_pack routes ONLY any-mode (occlusion) sweeps through a
    different-granularity pack (experiment hook; the cfg knob was removed as
    a measured loser — exp_shadow64.py); occlusion verdicts must be
    identical to brute force, and closest queries must ride the main pack."""
    scene = random_scene()
    cfg = RenderConfig(accel="pallas", chunk_size=32)
    scene = accel.with_chunks(scene, cfg)
    pack = trace.build_pack(scene, cfg)
    pack.any_pack = trace._pack_for(scene.tri_chunk_perm, scene.tri_vertices, 64)
    assert pack.any_pack.chunk_size == 64
    ro, rd = random_rays()
    occ = np.asarray(trace.any_triangle(scene, ro, rd, cfg, pack=pack))
    t, _, _ = intersect.triangle_test(ro, rd, scene.tri_vertices,
                                      cfg.det_epsilon, cfg.smallest_dist)
    want = np.asarray(jnp.any(t < intersect.BIG, axis=1))
    np.testing.assert_array_equal(occ, want)
    # closest query rides the primary (chunk-32) pack
    tp, _ = trace.closest_triangle(scene, ro, rd, cfg, pack=pack)
    tb, _ = brute(scene, ro, rd, cfg)
    np.testing.assert_array_equal(np.asarray(tp) < 1e29, np.asarray(tb) < 1e29)


def test_pallas_ray_count_not_multiple_of_tile():
    scene = random_scene(40)
    cfg = RenderConfig(accel="pallas", chunk_size=32)
    scene = accel.with_chunks(scene, cfg)
    ro, rd = random_rays(r=777, seed=2)  # not a multiple of 1024
    tp, ip = trace.closest_triangle(scene, ro, rd, cfg)
    assert tp.shape == (777,) and ip.shape == (777,)
    tb, ib = brute(scene, ro, rd, cfg)
    np.testing.assert_array_equal(np.asarray(ip) >= 0, ib >= 0)


def test_pallas_render_matches_chunked_image(reference_assets):
    """End-to-end: full wavefront render through the pallas path."""
    scene, cam = scenes.serial_obj_scene(reference_assets / "tetrahedron.obj",
                                         dtype=jnp.float32)
    cfg_b = RenderConfig(accel="bruteforce", max_depth=2)
    cfg_p = dataclasses.replace(cfg_b, accel="pallas", chunk_size=8)
    scene_p = accel.with_chunks(scene, cfg_p)
    camera = scenes.make_camera(cam, 32, 32, dtype=jnp.float32)
    img_b = np.asarray(render_image(scene, camera, cfg_b))
    img_p = np.asarray(render_image(scene_p, camera, cfg_p))
    err = np.abs(img_b - img_p).max(axis=-1)
    assert (err > 1e-3).mean() <= 0.01, f"max {err.max()}, frac {(err > 1e-3).mean()}"


def _full_slab_reference(ro, rd, lo, hi, nt):
    """Un-gated per-ray slab mask (the pre-gating exact-mask algorithm):
    every (ray, chunk) pair tested, OR-reduced per tile. The gated two-level
    mask must reproduce this wherever the interval shortlist fits the cap."""
    from realtrace_tpu.core.types import PARK_DISTANCE
    from realtrace_tpu.ops.intersect import BIG
    ro = np.asarray(ro, np.float32)
    rd = np.asarray(rd, np.float32)
    lo = np.asarray(lo, np.float32)
    hi = np.asarray(hi, np.float32)
    inv = np.where(rd != 0.0, 1.0 / np.where(rd != 0.0, rd, 1.0), float(BIG))
    live = ro[:, 0] != PARK_DISTANCE
    tn = np.zeros((ro.shape[0], lo.shape[0]), np.float32)
    tf = np.full((ro.shape[0], lo.shape[0]), float(BIG), np.float32)
    for ax in range(3):
        t1 = (lo[None, :, ax] - ro[:, None, ax]) * inv[:, None, ax]
        t2 = (hi[None, :, ax] - ro[:, None, ax]) * inv[:, None, ax]
        tn = np.maximum(tn, np.minimum(t1, t2))
        tf = np.minimum(tf, np.maximum(t1, t2))
    hit = (tf * (1.0 + 1e-6) + 1e-6 >= tn) & live[:, None]
    return hit.reshape(nt, trace.LANES, -1).any(axis=1)      # (nt, M)


def _mask_sets(chunk_list, counts):
    cl = np.asarray(chunk_list)[:, 0, :]
    cn = np.asarray(counts)[:, 0, 0]
    return [set(cl[i, :cn[i]].tolist()) for i in range(cl.shape[0])]


def test_gated_exact_mask_matches_full_slab():
    """The two-level (interval-gated) exact mask must equal the full per-ray
    slab mask when shortlists fit EXACT_GATE_CAP, and be conservative (a
    superset) otherwise; entries must be valid lower bounds (sorted)."""
    scene = random_scene(n=512, spread=2.0)
    cfg = RenderConfig(accel="pallas", chunk_size=32)
    scene = accel.with_chunks(scene, cfg)
    pack = trace.build_pack(scene, cfg)
    ro, rd = random_rays(r=2 * trace.LANES, seed=7)
    nt = 2
    ids, entry, counts = trace._chunk_mask_exact(ro, rd, pack.lo, pack.hi, nt)
    got = _mask_sets(ids, counts)
    want = _full_slab_reference(ro, rd, pack.lo, pack.hi, nt)
    m = pack.lo.shape[0]
    ids_i, _, counts_i = trace._chunk_mask(ro, rd, pack.lo, pack.hi, nt)
    cnt_i = np.asarray(counts_i)[:, 0, 0]
    for i in range(nt):
        ref = set(np.nonzero(want[i])[0].tolist())
        if cnt_i[i] <= trace.EXACT_GATE_CAP:
            assert got[i] == ref, f"tile {i}: gated != full slab"
        else:
            assert got[i] >= ref, f"tile {i}: gated mask dropped a chunk"
    # entries sorted ascending over the live prefix (the kernel's early-exit
    # contract: entry[j] bounds every later chunk)
    e = np.asarray(entry)[:, 0, :]
    cn = np.asarray(counts)[:, 0, 0]
    for i in range(nt):
        live = e[i, :cn[i]]
        assert np.all(np.diff(live) >= 0)


def test_super_gated_exact_mask_exactness():
    """With the super-chunk stage engaged (thresholds monkeypatched down),
    the mask must STILL equal the full per-ray slab set when shortlists fit
    the cap, and stay a superset otherwise — the super gate (per-ray slab on
    group AABBs) can only remove chunks no ray can hit (VERDICT r4 #3)."""
    scene = random_scene(n=512, spread=2.0)
    cfg = RenderConfig(accel="pallas", chunk_size=32)
    scene = accel.with_chunks(scene, cfg)
    pack = trace.build_pack(scene, cfg)
    ro, rd = random_rays(r=2 * trace.LANES, seed=21)
    nt = 2
    saved = trace.SUPER_GROUP
    try:
        trace.SUPER_GROUP = 4
        ids, entry, counts = trace._chunk_mask_exact(ro, rd, pack.lo,
                                                     pack.hi, nt,
                                                     super_gate=True)
    finally:
        trace.SUPER_GROUP = saved
    got = _mask_sets(ids, counts)
    want = _full_slab_reference(ro, rd, pack.lo, pack.hi, nt)
    ids_i, _, counts_i = trace._chunk_mask(ro, rd, pack.lo, pack.hi, nt)
    cnt_i = np.asarray(counts_i)[:, 0, 0]
    for i in range(nt):
        ref = set(np.nonzero(want[i])[0].tolist())
        if cnt_i[i] <= trace.EXACT_GATE_CAP:
            assert got[i] == ref, f"tile {i}: super-gated != full slab"
        else:
            assert got[i] >= ref, f"tile {i}: super gate dropped a chunk"
    e = np.asarray(entry)[:, 0, :]
    cn = np.asarray(counts)[:, 0, 0]
    for i in range(nt):
        assert np.all(np.diff(e[i, :cn[i]]) >= 0)


def test_super_gated_sweep_matches_bruteforce():
    """End-to-end: the pallas closest query through the super-gated BIG-scene
    heuristic (full-width exact mask) agrees with the dense bruteforce
    reference on every hit."""
    from realtrace_tpu.ops import intersect

    scene = random_scene(n=512, spread=2.0)
    cfg = RenderConfig(accel="pallas", chunk_size=32)
    scene = accel.with_chunks(scene, cfg)
    ro, rd = random_rays(r=2 * trace.LANES, seed=33)
    saved = (trace.SUPER_GROUP, trace.EXACT_MASK_MIN_TRIS)
    try:
        trace.SUPER_GROUP = 4
        trace.EXACT_MASK_MIN_TRIS = 1       # big-scene heuristic ON
        cfg_small = dataclasses.replace(cfg, exact_mask_rays=0)  # width says no
        t_p, idx_p = trace.closest_triangle(scene, ro, rd, cfg_small)
    finally:
        trace.SUPER_GROUP, trace.EXACT_MASK_MIN_TRIS = saved
    tv = scene.tri_vertices
    t_b, _, _ = intersect.triangle_test(ro, rd, tv, cfg.det_epsilon,
                                        cfg.smallest_dist)
    t_ref = jnp.min(t_b, axis=1)
    hit_ref = np.asarray(t_ref) < intersect.BIG
    np.testing.assert_array_equal(np.asarray(idx_p >= 0), hit_ref)
    np.testing.assert_allclose(np.asarray(t_p)[hit_ref],
                               np.asarray(t_ref)[hit_ref], rtol=1e-5)


def test_gated_exact_mask_overflow_tail_conservative():
    """With a tiny gate cap every interval chunk past the cap must survive
    un-refined (conservative tail), so exactness is cap-independent."""
    scene = random_scene(n=512, spread=2.0)
    cfg = RenderConfig(accel="pallas", chunk_size=32)
    scene = accel.with_chunks(scene, cfg)
    pack = trace.build_pack(scene, cfg)
    ro, rd = random_rays(r=trace.LANES, seed=13)
    saved = trace.EXACT_GATE_CAP
    try:
        trace.EXACT_GATE_CAP = 2
        ids, _, counts = trace._chunk_mask_exact(ro, rd, pack.lo, pack.hi, 1)
    finally:
        trace.EXACT_GATE_CAP = saved
    got = _mask_sets(ids, counts)[0]
    want = set(np.nonzero(
        _full_slab_reference(ro, rd, pack.lo, pack.hi, 1)[0])[0].tolist())
    assert got >= want


def test_pallas_streaming_path_matches(monkeypatch):
    """Force the HBM-streaming variant (big-scene path) and check it agrees."""
    monkeypatch.setattr(trace, "RESIDENT_LIMIT", 0)
    scene = random_scene()
    cfg = RenderConfig(accel="pallas", chunk_size=32)
    scene = accel.with_chunks(scene, cfg)
    ro, rd = random_rays()
    tp, ip = trace.closest_triangle(scene, ro, rd, cfg)
    tb, ib = brute(scene, ro, rd, cfg)
    np.testing.assert_array_equal(np.asarray(tp) < 1e29, tb < 1e29)
    both = tb < 1e29
    np.testing.assert_allclose(np.asarray(tp)[both], tb[both], rtol=1e-4)


def _bulk_tri_scene(n: int, seed: int):
    """n random triangles without the per-triangle SceneBuilder loop."""
    from realtrace_tpu.core.types import Materials

    rng = np.random.default_rng(seed)
    base = random_scene(n=1)
    tv = jnp.asarray(rng.uniform(-10, 10, (n, 1, 3))
                     + rng.uniform(-1.5, 1.5, (n, 3, 3)), jnp.float32)
    col = jnp.broadcast_to(jnp.asarray([0.8, 0.1, 0.0], jnp.float32), (n, 3, 3))
    return base.replace(tri_vertices=tv, tri_colors=col,
                        tri_materials=Materials.default(n))


def test_residency_decision_boundary_and_genuine_streaming():
    """Pin the residency DECISION (ops/pallas/trace.build_pack): a table at
    RESIDENT_LIMIT stays VMEM-resident, one chunk over switches to the
    HBM-streaming kernel — and drive that GENUINE (non-forced) streaming
    dispatch end-to-end against brute force. The big-scene path is otherwise
    only reachable by monkeypatching the limit."""
    cfg = RenderConfig(accel="pallas", chunk_size=32)
    per_tri = 4 * trace.FEAT * 4          # bytes/triangle in the B table
    n_at = trace.RESIDENT_LIMIT // per_tri        # chunk-divisible at-limit
    assert n_at % cfg.chunk_size == 0

    at = accel.with_chunks(_bulk_tri_scene(n_at, seed=20), cfg)
    assert trace.build_pack(at, cfg).resident

    over = accel.with_chunks(_bulk_tri_scene(n_at + 1, seed=21), cfg)
    pack = trace.build_pack(over, cfg)
    assert not pack.resident              # one padded chunk over the limit

    ro, rd = random_rays(r=256, seed=17)
    tp, _ = trace.closest_triangle(over, ro, rd, cfg, pack=pack)
    tb, _ = brute(over, ro, rd, cfg)
    np.testing.assert_array_equal(np.asarray(tp) < 1e29, np.asarray(tb) < 1e29)
    both = np.asarray(tb) < 1e29
    np.testing.assert_allclose(np.asarray(tp)[both], np.asarray(tb)[both],
                               rtol=1e-4)
