"""Dense vectorized primitive intersections + closest-hit / any-hit queries.

TPU-native redesign of the reference's per-object virtual ``intersect(Ray&)``
family (Serial/{triangle,sphere,plane,cylinder}.cpp): each family is tested as
one (rays x primitives) masked reduction on the VPU; the nearest hit is an
argmin, not a mutable Ray.

Gradient design: the discrete hit choice (argmin index) is stopped, then the
hit attributes (t, barycentrics, normal, position, color) are *recomputed*
differentiably from the selected primitive's parameters — gradients flow to
vertices / centers / radii / colors while visibility stays fixed (SURVEY §7
hard part (c)).
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from flax import struct
from jax import Array, lax

from realtrace_tpu.core import vec
from realtrace_tpu.core.types import RenderConfig, Scene

BIG = 1e30  # "no hit" distance sentinel (FLT_MAX analog, Serial/ray.h:25)

# Material scalars as a separate narrow (N, 6) shade table vs inlined into
# the wide geometry table. MEASURED WORSE (hit-heavy 180.0 vs 163.0 ms,
# benchmarks/exp_mat_split.py): any (R, k<=25) f32 array is laid out T(8,128)
# — minor dim padded to 128 lanes — so the narrow gather writes the same
# ~1.07GB physical as the wide one, plus an extra gather pass. Kept only as
# the A/B hook; default False.
MAT_SPLIT = False
# Materialize the 6 material columns as ONE barrier-pinned (R, 6) block
# slice of the gathered table, then extract from that: XLA lays narrow
# non-gather (R, k) arrays COLUMN-major ({0,1:T(...,128)}), so the six
# per-column extracts become contiguous row reads instead of six strided
# sweeps of the fat {1,0:T(8,128)} gather output (4.29ms each, 3x/frame at
# hit-heavy 1080p — round-4 profile). Measured (same-session A/B,
# benchmarks/exp_mat_block.py): hit-heavy 119.7 -> 115.3 ms, headline
# 27.2 -> 26.7 ms.
MAT_BLOCK_SLICE = True
# Transpose the gathered shade table to (25, R) once behind an
# optimization_barrier so downstream column extracts become contiguous row
# slices. MEASURED MUCH WORSE (hit-heavy 356.4 vs 160.0 ms, headline 32.5 vs
# 26.6; benchmarks/exp_trans_gather.py): XLA's materialized (R,25)->(25,R)
# transpose is a scalar-ish relayout that costs far more than the six
# strided extract fusions it replaces. Kept only as the A/B hook.
TRANS_GATHER = False

# Backward of the wide (R, k) shade-table row gather. The mathematical dual
# is a scatter-add of ~2M 25-column cotangent rows into the (N, k) table per
# bounce level — XLA's unsorted scatter was the round-4 hit-heavy backward's
# dominant cost (17.9 + 17.4 + 8.9 ms of the 277.95 ms step, docs/KERNEL.md).
# "scatter" (DEFAULT): XLA's native dual. "sort": custom VJP — argsort the
# triangle ids, row-gather the cotangents into id order, segment-sum
# contiguous runs — MEASURED A DECISIVE LOSER on TPU (2026-08-21 A/B,
# benchmarks/captures/gradab_r5.json: hit-heavy bwd/fwd 4.93x vs 2.57x,
# headline 1.84x vs 1.60x — the 2M-row argsort + (R,25) cotangent
# row-gather cost far more than the unsorted scatter they replace); kept
# only as the A/B hook. "save": scatter dual + the gather output saved as a
# "sweep"-tagged residual (skips the backward's re-gather) — measured
# INFEASIBLE at hit-heavy 1080p: the (R,25) residuals push the step past
# HBM ("Used 17.17G of 15.75G"). Both alternatives to the plain scatter
# lost; it IS the mathematical dual and runs at ~14 ns/cotangent-row.
# Env RT_GATHER_VJP overrides.
GATHER_VJP = os.environ.get("RT_GATHER_VJP", "scatter")


@functools.lru_cache(maxsize=None)
def _gather_rows_sorted(n: int):
    """Row gather ``table[idx]`` whose VJP is sort + sorted segment-sum
    instead of an unsorted scatter-add (see GATHER_VJP). Forward is
    bit-identical to plain indexing; the backward is an exact reordering of
    the same float additions (per-segment order fixed by the stable sort, so
    grads stay deterministic — tests/test_grad.py FD-validates through it)."""
    import numpy as np

    @jax.custom_vjp
    def gather(table, idx):
        return table[idx]

    def fwd(table, idx):
        return table[idx], idx

    def bwd(idx, ct):
        order = jnp.argsort(idx, stable=True).astype(jnp.int32)
        dtab = jax.ops.segment_sum(ct[order], idx[order], num_segments=n,
                                   indices_are_sorted=True)
        return dtab, np.zeros(idx.shape, jax.dtypes.float0)

    gather.defvjp(fwd, bwd)
    return gather


def _table_gather(table: Array, idx: Array) -> Array:
    if GATHER_VJP == "sort":
        return _gather_rows_sorted(table.shape[0])(table, idx)
    if GATHER_VJP == "save":
        from jax.ad_checkpoint import checkpoint_name
        return checkpoint_name(table[idx], "sweep")
    return table[idx]


# family codes
FAM_NONE, FAM_TRI, FAM_SPH, FAM_PLN, FAM_CYL = 0, 1, 2, 3, 4


@struct.dataclass
class Hit:
    """Per-ray hit record (SoA). The wavefront analog of the reference Ray's
    mutable hit state (Serial/ray.h:20-27)."""

    valid: Array     # (R,) bool
    t: Array         # (R,)
    family: Array    # (R,) int32, FAM_*
    index: Array     # (R,) int32 primitive index within family
    position: Array  # (R, 3)
    normal: Array    # (R, 3) geometric normal, unnormalized (as in reference)
    color: Array     # (R, 3) surface base color at hit (barycentric-interpolated for tris)
    ka: Array        # (R,)
    kd: Array
    ks: Array
    kr: Array
    kt: Array
    eta: Array


# ---------------------------------------------------------------------------
# per-family dense tests — each returns candidate (t, aux) over (R, N)
# ---------------------------------------------------------------------------

def triangle_test(ro: Array, rd: Array, tv: Array, det_eps: float, t_min: float):
    """Cramer/Möller–Trumbore triangle test.

    Ref: Triangle::intersect, Serial/triangle.cpp:10-24 — determinant form
    det(A-B, A-C, D) with accept ``beta>0 && gamma>0 && beta+gamma<1``.

    Args:
      ro, rd: (R, 3) ray origins/directions.
      tv: (N, 3, 3) triangle vertices (A, B, C rows).
    Returns:
      t: (R, N) hit distance (BIG where invalid), beta, gamma: (R, N).
    """
    a, b, c = tv[:, 0], tv[:, 1], tv[:, 2]
    e1 = a - b                                   # (N,3)
    e2 = a - c
    n = vec.cross(e1, e2)                        # (N,3) = geometric normal
    # det(e1, e2, d) = d . (e1 x e2) = d . n  — a (R,3)x(3,N) contraction
    det = rd @ n.T                               # (R,N)
    s = a[None, :, :] - ro[:, None, :]           # (R,N,3) = A - O
    # t_num = det(e1, e2, s) = s . n
    t_num = vec.dot(s, n[None])                  # (R,N)
    # beta_num = det(s, e2, d) = d . (s x e2)
    beta_num = vec.dot(rd[:, None, :], jnp.cross(s, e2[None]))
    # gamma_num = det(e1, s, d) = d . (e1 x s)
    gamma_num = vec.dot(rd[:, None, :], jnp.cross(e1[None], s))
    det_ok = jnp.abs(det) >= det_eps
    safe = jnp.where(det_ok, det, 1.0)
    inv = 1.0 / safe
    beta = beta_num * inv
    gamma = gamma_num * inv
    t = t_num * inv
    bary_ok = (beta > 0.0) & (gamma > 0.0) & (beta + gamma < 1.0)
    ok = det_ok & bary_ok & (t > t_min)
    return jnp.where(ok, t, BIG), beta, gamma


def sphere_test(ro: Array, rd: Array, center: Array, radius: Array, t_min: float):
    """Quadratic sphere test, both roots, nearest valid.

    Ref: Sphere::intersect, Serial/sphere.cpp:5-39 (rd assumed normalized,
    a=1).
    """
    cv = ro[:, None, :] - center[None]           # (R,N,3)
    b = 2.0 * vec.dot(rd[:, None, :], cv)        # (R,N)
    c = vec.dot(cv, cv) - (radius * radius)[None]
    disc = b * b - 4.0 * c
    ok = disc >= 0.0
    sq = jnp.sqrt(jnp.where(ok, disc, 0.0))
    t1 = (-b + sq) * 0.5
    t2 = (-b - sq) * 0.5
    t1 = jnp.where(ok & (t1 > t_min), t1, BIG)
    t2 = jnp.where(ok & (t2 > t_min), t2, BIG)
    return jnp.minimum(t1, t2)


def quad_test(ro: Array, rd: Array, corners: Array, det_eps: float, t_min: float):
    """Quad ("Plane") = two triangle tests (p1,p2,p3) then (p1,p3,p4).

    Ref: Plane::intersect, Serial/plane.cpp:24-27 — note the reference
    short-circuits the second triangle when the first one's barycentric test
    passes; the regions are disjoint for a planar quad so taking the nearest
    valid of both is equivalent.
    """
    p1, p2, p3, p4 = corners[:, 0], corners[:, 1], corners[:, 2], corners[:, 3]
    t_a, _, _ = triangle_test(ro, rd, jnp.stack([p1, p2, p3], axis=1), det_eps, t_min)
    t_b, _, _ = triangle_test(ro, rd, jnp.stack([p1, p3, p4], axis=1), det_eps, t_min)
    return jnp.minimum(t_a, t_b)


def cylinder_test(ro: Array, rd: Array, center: Array, up: Array, radius: Array, t_min: float):
    """Infinite cylinder: quadratic in the plane ⊥ axis.

    Ref: Cylinder::intersect, Serial/cylinder.cpp:14-32 — picks the smaller
    root if positive, else the larger one.
    """
    d_par = vec.dot(rd[:, None, :], up[None])[..., None] * up[None]      # (R,N,3)
    tmp1 = rd[:, None, :] - d_par
    oc = ro[:, None, :] - center[None]
    oc_par = vec.dot(oc, up[None])[..., None] * up[None]
    tmp2 = oc - oc_par
    a = vec.dot(tmp1, tmp1)
    b = 2.0 * vec.dot(tmp1, tmp2)
    c = vec.dot(tmp2, tmp2) - (radius * radius)[None]
    disc = b * b - 4.0 * a * c
    ok = (disc >= 0.0) & (jnp.abs(a) > 0.0)
    a_safe = jnp.where(jnp.abs(a) > 0.0, a, 1.0)
    sq = jnp.sqrt(jnp.where(ok, disc, 0.0))
    r1 = (-b + sq) / (2.0 * a_safe)
    r2 = (-b - sq) / (2.0 * a_safe)
    lo = jnp.minimum(r1, r2)
    hi = jnp.maximum(r1, r2)
    t = jnp.where(lo > 0.0, lo, hi)
    return jnp.where(ok & (t > t_min), t, BIG)


# ---------------------------------------------------------------------------
# closest hit
# ---------------------------------------------------------------------------

def _tri_closest(scene: Scene, ro: Array, rd: Array, cfg: RenderConfig,
                 pack=None, feat=None, exact_mask=None):
    """Nearest triangle per ray: (t, idx) with BIG/-1 for miss.

    Dispatches on cfg.accel. The pallas path returns SORTED-space indices
    (mapped back to originals through the shade table's index column —
    avoiding a narrow 2M-ray permutation gather). ``feat`` optionally supplies
    a prebuilt (FEAT, R) accel feature matrix (the pipeline builds the primary
    wavefront's row-major, skipping a full-wavefront relayout).
    """
    if scene.n_triangles == 0:
        r = ro.shape[0]
        return jnp.full((r,), BIG, ro.dtype), jnp.full((r,), -1, jnp.int32)
    if cfg.accel == "bruteforce":
        t, _, _ = triangle_test(ro, rd, scene.tri_vertices, cfg.det_epsilon, cfg.smallest_dist)
        idx = jnp.argmin(t, axis=1).astype(jnp.int32)
        tbest = jnp.take_along_axis(t, idx[:, None], axis=1)[:, 0]
        return tbest, jnp.where(tbest < BIG, idx, -1)
    if cfg.accel == "pallas":
        from realtrace_tpu.ops.pallas import trace
        return trace.closest_triangle(scene, ro, rd, cfg, pack=pack,
                                      raw_idx=True, feat=feat,
                                      exact_mask=exact_mask)
    from realtrace_tpu.ops import accel
    return accel.closest_triangle(scene, ro, rd, cfg)


def _family_min(cands):
    """Merge per-family (t, family_code, idx) candidates by nearest t."""
    t, fam, idx = cands[0]
    for t2, fam2, idx2 in cands[1:]:
        closer = t2 < t
        t = jnp.where(closer, t2, t)
        fam = jnp.where(closer, fam2, fam)
        idx = jnp.where(closer, idx2, idx)
    return t, fam, idx


def closest_query(scene: Scene, ro: Array, rd: Array, cfg: RenderConfig,
                  pack=None, feat=None, exact_mask=None):
    """Forward-only nearest-hit SELECTION over all primitive families:
    ``(t_fwd, fam, idx)`` per ray (idx is family-local; triangles in pallas
    mode are SORTED-space — ``hit_attributes`` maps back). Split from the
    attribute recompute so callers can compact the (expensive, differentiable)
    shading to hit tiles only. The discrete part of
    ``World::firstIntersection`` (Serial/world.cpp:5-17)."""
    i32 = jnp.int32

    cands = []
    t_tri, idx_tri = _tri_closest(scene, lax.stop_gradient(ro), lax.stop_gradient(rd),
                                  cfg, pack=pack,
                                  feat=None if feat is None else lax.stop_gradient(feat),
                                  exact_mask=exact_mask)
    cands.append((t_tri, jnp.where(idx_tri >= 0, FAM_TRI, FAM_NONE), idx_tri))

    sro, srd = lax.stop_gradient(ro), lax.stop_gradient(rd)
    if scene.n_spheres:
        t = sphere_test(sro, srd, lax.stop_gradient(scene.sph_center),
                        lax.stop_gradient(scene.sph_radius), cfg.smallest_dist)
        i = jnp.argmin(t, axis=1).astype(i32)
        # min == t[argmin]: a reduce, NOT take_along_axis — the (R,1)
        # scalar-space gather profiled 15 ms at 2M rays on the glass
        # scene (one sphere!); jnp.min fuses into the test epilogue
        tb = jnp.min(t, axis=1)
        cands.append((tb, jnp.where(tb < BIG, FAM_SPH, FAM_NONE), i))
    if scene.n_planes:
        t = quad_test(sro, srd, lax.stop_gradient(scene.pln_corners), cfg.det_epsilon, cfg.smallest_dist)
        i = jnp.argmin(t, axis=1).astype(i32)
        # min == t[argmin]: a reduce, NOT take_along_axis — the (R,1)
        # scalar-space gather profiled 15 ms at 2M rays on the glass
        # scene (one sphere!); jnp.min fuses into the test epilogue
        tb = jnp.min(t, axis=1)
        cands.append((tb, jnp.where(tb < BIG, FAM_PLN, FAM_NONE), i))
    if scene.n_cylinders:
        t = cylinder_test(sro, srd, lax.stop_gradient(scene.cyl_center),
                          lax.stop_gradient(scene.cyl_up), lax.stop_gradient(scene.cyl_radius),
                          cfg.smallest_dist)
        i = jnp.argmin(t, axis=1).astype(i32)
        # min == t[argmin]: a reduce, NOT take_along_axis — the (R,1)
        # scalar-space gather profiled 15 ms at 2M rays on the glass
        # scene (one sphere!); jnp.min fuses into the test epilogue
        tb = jnp.min(t, axis=1)
        cands.append((tb, jnp.where(tb < BIG, FAM_CYL, FAM_NONE), i))

    t_fwd, fam, idx = _family_min(cands)
    valid = fam != FAM_NONE
    idx = jnp.where(valid, idx, 0)  # safe gather index
    # residual-cache tag: under the render's rematerialized backward
    # (render/pipeline, policy save_only_these_names("sweep")) the selection
    # is SAVED from the forward — the backward replays only the differentiable
    # attribute recompute, never the accel sweep itself
    from jax.ad_checkpoint import checkpoint_name
    t_fwd = checkpoint_name(t_fwd, "sweep")
    fam = checkpoint_name(fam, "sweep")
    idx = checkpoint_name(idx, "sweep")
    return t_fwd, fam, idx


def hit_attributes(scene: Scene, ro: Array, rd: Array, t_fwd: Array, fam: Array,
                   idx: Array, cfg: RenderConfig, pack=None) -> Hit:
    """Differentiable attribute recomputation for a selected hit
    ``(t_fwd, fam, idx)`` (from ``closest_query``): position, normal,
    barycentric color, material scalars — recomputed from the original scene
    arrays so gradients flow while visibility stays fixed (SURVEY §7 (c))."""
    r = ro.shape[0]
    dt = ro.dtype
    i32 = jnp.int32
    valid = fam != FAM_NONE

    # ---- differentiable recomputation per family ------------------------
    zero3 = jnp.zeros((r, 3), dt)
    zero = jnp.zeros((r,), dt)
    t_d, normal, color = jnp.full((r,), BIG, dt), zero3, zero3
    mats = {k: zero for k in ("ka", "kd", "ks", "kr", "kt", "eta")}

    def sel(mask, new, old):
        if new.ndim == old.ndim + 1 or (new.ndim == 2 and old.ndim == 2):
            return jnp.where(mask[:, None], new, old)
        return jnp.where(mask, new, old)

    index_out = idx
    if scene.n_triangles:
        m = valid & (fam == FAM_TRI)
        # Row gathers from the shade tables — ~10 separate narrow gathers at
        # 2M rays cost ~190ms on TPU; wide row gathers are near DMA speed.
        # Differentiable w.r.t. the table values. The material scalars ride a
        # SEPARATE narrow (N, 6) table (MAT_SPLIT): each downstream material
        # column extract relayouts a (R, 6) array instead of re-streaming the
        # full (R, 25) gather result (the round-3 profile's ~26ms).
        tm = scene.tri_materials
        geom_cols = [
            scene.tri_vertices.reshape(-1, 9),
            scene.tri_colors.reshape(-1, 9),
        ]
        mat_cols = jnp.stack([tm.ka, tm.kd, tm.ks, tm.kr, tm.kt, tm.eta],
                             axis=1)                       # (N, 6)
        if not MAT_SPLIT:
            geom_cols.append(mat_cols)
        table = jnp.concatenate(geom_cols, axis=1)         # (N, 18 or 24)
        nc = table.shape[1]
        if cfg.accel == "pallas":
            # pallas idx is SORTED-space: gather from the permuted table and
            # recover the original triangle id from an index column (exact in
            # f32/f64 below 2^24 triangles) — no per-ray perm gather.
            perm = pack.perm if pack is not None else scene.tri_chunk_perm
            table = jnp.concatenate(
                [table[perm], perm.astype(dt)[:, None]], axis=1)
            g = _table_gather(table, idx)                  # (R, nc+1)
            gm = _table_gather(mat_cols[perm], idx) if MAT_SPLIT else None
        else:
            g = _table_gather(table, idx)                  # (R, nc)
            gm = _table_gather(mat_cols, idx) if MAT_SPLIT else None
        if TRANS_GATHER:
            # ONE materialized transpose: (R, k) f32 lays out T(8,128) —
            # minor dim padded to 128 lanes, so the gathered table is ~5.1x
            # its logical bytes in HBM and every strided column extract
            # re-reads all of it (measured 10.9 GiB/s useful BW). (25, R) is
            # sublane-major (1.28x padding) and every column access below
            # becomes a contiguous row slice. The barrier stops XLA from
            # canonicalizing the transpose back into per-consumer strided
            # slices of the fat layout.
            gT = lax.optimization_barrier(g.T)
            gcol = lambda j: gT[j]
            gmT = gT if gm is None else lax.optimization_barrier(gm.T)
            gmcol = (lambda j: gmT[18 + j]) if gm is None else (lambda j: gmT[j])
        elif MAT_BLOCK_SLICE and gm is None:
            gcol = lambda j: g[:, j]
            gm_blk = lax.optimization_barrier(
                lax.slice_in_dim(g, 18, 24, axis=1))    # (R, 6) column-major
            gmcol = lambda j: gm_blk[:, j]
        else:
            gcol = lambda j: g[:, j]
            gmcol = (lambda j: g[:, 18 + j]) if gm is None else (lambda j: gm[:, j])
        if cfg.accel == "pallas":
            index_out = jnp.where(m, gcol(nc).astype(i32), index_out)
        # COLUMNAR math: slice the gather into (R,) columns and keep every
        # cross/dot as scalar mul/add chains — one XLA loop fusion reading
        # the gathered table ONCE. The (R,3)-vector formulation (reshape +
        # vec.dot) compiled to SIX separate full-width reduce fusions +
        # relayout copies that each re-streamed the gathered array from HBM
        # (~22ms/level at hit-heavy 1080p; see docs/KERNEL.md round-3).
        ax, ay, az = gcol(0), gcol(1), gcol(2)
        bx, by, bz = gcol(3), gcol(4), gcol(5)
        cx, cy, cz = gcol(6), gcol(7), gcol(8)
        rx, ry, rz = rd[:, 0], rd[:, 1], rd[:, 2]
        ox, oy, oz = ro[:, 0], ro[:, 1], ro[:, 2]
        e1x, e1y, e1z = ax - bx, ay - by, az - bz
        e2x, e2y, e2z = ax - cx, ay - cy, az - cz
        nx = e1y * e2z - e1z * e2y
        ny = e1z * e2x - e1x * e2z
        nz = e1x * e2y - e1y * e2x
        det = rx * nx + ry * ny + rz * nz
        det_safe = jnp.where(jnp.abs(det) > 0, det, 1.0)
        sx, sy, sz = ax - ox, ay - oy, az - oz
        tt = (sx * nx + sy * ny + sz * nz) / det_safe
        # beta = rd . (s x e2) / det ; gamma = rd . (e1 x s) / det
        beta = (rx * (sy * e2z - sz * e2y) + ry * (sz * e2x - sx * e2z)
                + rz * (sx * e2y - sy * e2x)) / det_safe
        gamma = (rx * (e1y * sz - e1z * sy) + ry * (e1z * sx - e1x * sz)
                 + rz * (e1x * sy - e1y * sx)) / det_safe
        alpha = 1.0 - beta - gamma
        col = jnp.stack(
            [alpha * gcol(9) + beta * gcol(12) + gamma * gcol(15),
             alpha * gcol(10) + beta * gcol(13) + gamma * gcol(16),
             alpha * gcol(11) + beta * gcol(14) + gamma * gcol(17)], axis=1)
        t_d = sel(m, tt, t_d)
        normal = sel(m, jnp.stack([nx, ny, nz], axis=1), normal)
        color = sel(m, col, color)
        for j, k in enumerate(("ka", "kd", "ks", "kr", "kt", "eta")):
            mats[k] = sel(m, gmcol(j), mats[k])

    if scene.n_spheres:
        m = valid & (fam == FAM_SPH)
        ctr = scene.sph_center[idx]
        rad = scene.sph_radius[idx]
        cv = ro - ctr
        b2 = 2.0 * vec.dot(rd, cv)
        c2 = vec.dot(cv, cv) - rad * rad
        disc = b2 * b2 - 4.0 * c2
        dok = disc > 0.0
        sq = jnp.where(dok, jnp.sqrt(jnp.where(dok, disc, 1.0)), 0.0)
        r1, r2 = (-b2 + sq) * 0.5, (-b2 - sq) * 0.5
        # pick the root matching the (stopped) forward decision
        tt = jnp.where(jnp.abs(lax.stop_gradient(r1) - t_fwd)
                       < jnp.abs(lax.stop_gradient(r2) - t_fwd), r1, r2)
        pos = ro + tt[:, None] * rd
        t_d = sel(m, tt, t_d)
        normal = sel(m, pos - ctr, normal)   # Sphere::getNormalAtPosition
        color = sel(m, scene.sph_color[idx], color)
        for k in mats:
            mats[k] = sel(m, getattr(scene.sph_materials, k)[idx], mats[k])

    if scene.n_planes:
        m = valid & (fam == FAM_PLN)
        cr = scene.pln_corners[idx]
        p1, p2, p3 = cr[:, 0], cr[:, 1], cr[:, 2]
        nrm = vec.cross(p3 - p1, p2 - p1)    # Plane ctor normal, Serial/plane.h:24
        det = vec.dot(rd, nrm)
        det_safe = jnp.where(jnp.abs(det) > 0, det, 1.0)
        tt = vec.dot(p1 - ro, nrm) / det_safe
        t_d = sel(m, tt, t_d)
        normal = sel(m, nrm, normal)
        color = sel(m, scene.pln_color[idx], color)
        for k in mats:
            mats[k] = sel(m, getattr(scene.pln_materials, k)[idx], mats[k])

    if scene.n_cylinders:
        m = valid & (fam == FAM_CYL)
        ctr, up, rad = scene.cyl_center[idx], scene.cyl_up[idx], scene.cyl_radius[idx]
        d_par = vec.dot(rd, up)[:, None] * up
        tmp1 = rd - d_par
        oc = ro - ctr
        tmp2 = oc - vec.dot(oc, up)[:, None] * up
        a2 = vec.dot(tmp1, tmp1)
        b2 = 2.0 * vec.dot(tmp1, tmp2)
        c2 = vec.dot(tmp2, tmp2) - rad * rad
        disc = b2 * b2 - 4.0 * a2 * c2
        dok = disc > 0.0
        a_safe = jnp.where(jnp.abs(a2) > 0, a2, 1.0)
        sq = jnp.where(dok, jnp.sqrt(jnp.where(dok, disc, 1.0)), 0.0)
        r1, r2 = (-b2 + sq) / (2 * a_safe), (-b2 - sq) / (2 * a_safe)
        tt = jnp.where(jnp.abs(lax.stop_gradient(r1) - t_fwd)
                       < jnp.abs(lax.stop_gradient(r2) - t_fwd), r1, r2)
        pos = ro + tt[:, None] * rd
        # Cylinder::getNormalAtPosition: p - c - ((p-c).u/(u.u)) u
        pc = pos - ctr
        proj = vec.dot(pc, up) / jnp.maximum(vec.dot(up, up), 1e-30)
        t_d = sel(m, tt, t_d)
        normal = sel(m, pc - proj[:, None] * up, normal)
        color = sel(m, scene.cyl_color[idx], color)
        for k in mats:
            mats[k] = sel(m, getattr(scene.cyl_materials, k)[idx], mats[k])

    t_final = jnp.where(valid, t_d, BIG)
    position = ro + t_final[:, None] * rd
    return Hit(valid=valid, t=t_final, family=fam, index=jnp.where(valid, index_out, -1),
               position=jnp.where(valid[:, None], position, 0.0),
               normal=normal, color=color, **mats)


def closest_hit(scene: Scene, ro: Array, rd: Array, cfg: RenderConfig,
                pack=None) -> Hit:
    """Nearest hit over all primitive families, with differentiable attribute
    recomputation. The wavefront analog of ``World::firstIntersection``
    (Serial/world.cpp:5-17). ``pack`` is the optional precomputed AccelPack
    (pallas mode), built once per frame by the wavefront loop.
    """
    t_fwd, fam, idx = closest_query(scene, ro, rd, cfg, pack=pack)
    return hit_attributes(scene, ro, rd, t_fwd, fam, idx, cfg, pack=pack)


def any_hit(scene: Scene, ro: Array, rd: Array, cfg: RenderConfig,
            pack=None, exact_mask=None) -> Array:
    """Occlusion query for shadow rays: does *anything* intersect with
    t > SMALLEST_DIST?  Ref semantics: the serial shadow test runs a full
    firstIntersection and checks didHit() (Serial/world.cpp:44-47) — no
    max-distance cutoff at the light, which we reproduce.
    """
    ro = lax.stop_gradient(ro)
    rd = lax.stop_gradient(rd)
    r = ro.shape[0]
    occ = jnp.zeros((r,), bool)
    if scene.n_triangles:
        if cfg.accel == "bruteforce":
            t, _, _ = triangle_test(ro, rd, lax.stop_gradient(scene.tri_vertices),
                                    cfg.det_epsilon, cfg.smallest_dist)
            occ |= jnp.any(t < BIG, axis=1)
        elif cfg.accel == "pallas":
            from realtrace_tpu.ops.pallas import trace
            occ |= trace.any_triangle(scene, ro, rd, cfg, pack=pack,
                                      exact_mask=exact_mask)
        else:
            from realtrace_tpu.ops import accel
            occ |= accel.any_triangle(scene, ro, rd, cfg)
    if scene.n_spheres:
        t = sphere_test(ro, rd, lax.stop_gradient(scene.sph_center),
                        lax.stop_gradient(scene.sph_radius), cfg.smallest_dist)
        occ |= jnp.any(t < BIG, axis=1)
    if scene.n_planes:
        t = quad_test(ro, rd, lax.stop_gradient(scene.pln_corners), cfg.det_epsilon, cfg.smallest_dist)
        occ |= jnp.any(t < BIG, axis=1)
    if scene.n_cylinders:
        t = cylinder_test(ro, rd, lax.stop_gradient(scene.cyl_center),
                          lax.stop_gradient(scene.cyl_up), lax.stop_gradient(scene.cyl_radius),
                          cfg.smallest_dist)
        occ |= jnp.any(t < BIG, axis=1)
    from jax.ad_checkpoint import checkpoint_name
    return checkpoint_name(occ, "sweep")
