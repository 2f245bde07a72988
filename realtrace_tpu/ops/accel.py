"""Acceleration structure: Morton-sorted chunk-AABB sweep.

TPU-native replacement for the reference's uniform voxel grid
(Serial/uniform-grid.cpp:54-256, CSR variant Parellel/structures.cu:138-320).
A per-ray 3-D DDA walk is lane-divergent and gather-heavy — hostile to the
8x128 VPU. Instead (the "stackless sorted-AABB sweep" of the north star):

  build:  sort triangles by Morton code of their centroid → contiguous chunks
          of ``chunk_size`` spatially-local triangles → one AABB per chunk.
  query:  slab-test rays against ALL chunk AABBs (dense, vectorized, cheap),
          then intersect only the triangles of the most-voted chunks for a
          coherent ray block (dense Möller–Trumbore over a gathered shortlist).

The build is the analog of the CUDA counting-sort CSR build
(Parellel/kernel.cu:457-522) — sort + segmented reduce instead of atomics.
The Pallas kernel (ops/pallas) runs the same chunk sweep with real per-chunk
skipping; this XLA version uses a static per-block shortlist.

The chunk permutation is topology-only (static int32); triangle *positions*
remain differentiable because hit attributes are recomputed from the original
arrays in ``closest_hit``.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import Array, lax

from realtrace_tpu.core.types import RenderConfig, Scene
from realtrace_tpu.ops.intersect import BIG, triangle_test


def default_exact_accel() -> str:
    """The EXACT accel mode for the current backend: the Pallas sweep on TPU,
    brute force elsewhere (the Pallas kernel runs interpreted — slowly — off
    TPU). User-facing apps default to this; the approximate "chunked"
    shortlist mode is opt-in only."""
    return "pallas" if jax.default_backend() == "tpu" else "bruteforce"


def warn_if_approximate(cfg: RenderConfig) -> None:
    """Loud runtime warning when the APPROXIMATE shortlist mode is selected:
    a hit in a chunk that misses the top-k shortlist is silently dropped
    (see RenderConfig.accel). Exact modes: bruteforce, pallas."""
    if cfg.accel == "chunked":
        import sys
        print("[WARNING] accel='chunked' is APPROXIMATE: rays test only the "
              f"top-{cfg.shortlist} most-voted chunks per block, so hits can "
              "be silently dropped. Use accel='pallas' (TPU) or "
              "'bruteforce' for exact results.", file=sys.stderr, flush=True)


# ---------------------------------------------------------------------------
# build
# ---------------------------------------------------------------------------

def _morton3(x: np.ndarray, y: np.ndarray, z: np.ndarray) -> np.ndarray:
    """Interleave 10-bit coords into 30-bit Morton codes (uint64)."""
    def spread(v):
        v = v.astype(np.uint64)
        v = (v | (v << 32)) & np.uint64(0x1F00000000FFFF)
        v = (v | (v << 16)) & np.uint64(0x1F0000FF0000FF)
        v = (v | (v << 8)) & np.uint64(0x100F00F00F00F00F)
        v = (v | (v << 4)) & np.uint64(0x10C30C30C30C30C3)
        v = (v | (v << 2)) & np.uint64(0x1249249249249249)
        return v
    return spread(x) | (spread(y) << np.uint64(1)) | (spread(z) << np.uint64(2))


def build_chunk_perm(tri_vertices, chunk_size: int) -> np.ndarray:
    """Morton-sort triangle indices and pad to a chunk multiple.

    Host-side, topology-only (concrete values). Padding repeats the last
    triangle — duplicates produce identical nearest hits, so results are
    unchanged.
    Returns int32 (n_chunks * chunk_size,) permutation into the original
    triangle arrays.
    """
    tv = np.asarray(tri_vertices, np.float64)
    n = tv.shape[0]
    if n == 0:
        return np.zeros((0,), np.int32)
    cent = tv.mean(axis=1)                                 # (N,3)
    lo, hi = cent.min(0), cent.max(0)
    ext = np.where(hi - lo > 0, hi - lo, 1.0)
    q = np.clip(((cent - lo) / ext * 1023.0), 0, 1023).astype(np.uint32)
    order = np.argsort(_morton3(q[:, 0], q[:, 1], q[:, 2]), kind="stable")
    pad = (-n) % chunk_size
    if pad:
        order = np.concatenate([order, np.repeat(order[-1], pad)])
    return order.astype(np.int32)


# Big-scene chunk-size policy, set by the 2026-08-21 TPU grid (all arms in
# benchmarks/captures/bigcurve_r5.json / docs/KERNEL.md round-5):
# - TARGET_CHUNKS: above ~512 chunks the masks and lists cost more than
#   bigger chunks do — bob x4 measured 16.3 Mrays/s at chunk 128 (334
#   chunks) vs 15.1 at chunk 64 (668).
# - MAX_CHUNK_SIZE: growth stops at 256 — bob x16 at chunk 512 measured
#   1.7 vs 2.6 at chunk 256 (per-visit sweep work too coarse).
# - MAX_CHUNKS is the HARD SMEM ceiling and overrides the size cap: the
#   sweep's per-tile chunk lists are scalar-prefetched into SMEM, observed
#   to overflow at 2670 chunks ("prefetched SMEM operand" 1.31MB > 1MB;
#   1336 compiled fine).
# All growth doubles, preserving 4*chunk_size % 128 == 0 (resident-lane
# alignment). Flagship bob x1/x2 configs (334 chunks) are never rescaled.
TARGET_CHUNKS = 512
MAX_CHUNK_SIZE = 256
MAX_CHUNKS = 1536


def effective_chunk_size(cfg: RenderConfig, n_tris: int) -> int:
    cs = cfg.chunk_size
    while n_tris > cs * TARGET_CHUNKS and cs < MAX_CHUNK_SIZE:
        cs *= 2
    while n_tris > cs * MAX_CHUNKS:      # SMEM hard limit wins over the cap
        cs *= 2
    return cs


def with_chunks(scene: Scene, cfg: RenderConfig) -> Scene:
    """Attach the chunk permutation to the scene (stored as an int32 leaf).

    Uses the ON-DEVICE median-split build (one jitted stable argsort per
    bisection level) — scene arrays already live on the accelerator, and
    pulling vertices back to the host costs a device->host transfer on a
    path that the remote-TPU tunnel makes expensive.
    ``build_chunk_perm_split`` is the host/numpy reference implementation;
    ``build_chunk_perm``/``chunk_perm_device`` keep the older Morton
    ordering (any ordering is correct — see ``_sorted_chunks`` — but the
    nested bisection's chunk AABBs are ~2.6x smaller by surface area on bob,
    so every sweep lists fewer chunks; benchmarks/exp_split_build.py).
    """
    if scene.n_triangles == 0:
        return scene.replace(tri_chunk_perm=jnp.zeros((0,), jnp.int32))
    perm = jax.jit(chunk_perm_split_device, static_argnums=1)(
        scene.tri_vertices, effective_chunk_size(cfg, scene.n_triangles))
    return scene.replace(tri_chunk_perm=perm)


def _spread10_jnp(v: Array) -> Array:
    """uint32 10-bit coordinate -> every 3rd bit of 30 (device Morton)."""
    u = jnp.uint32
    v = (v | (v << u(16))) & u(0x030000FF)
    v = (v | (v << u(8))) & u(0x0300F00F)
    v = (v | (v << u(4))) & u(0x030C30C3)
    v = (v | (v << u(2))) & u(0x09249249)
    return v


def chunk_perm_device(tri_vertices: Array, chunk_size: int) -> Array:
    """jit-compatible Morton chunk permutation (device argsort).

    The on-device analog of ``build_chunk_perm`` — the TPU counterpart of the
    CUDA GPU-side grid rebuild (Parellel/kernel.cu:457-522) — so inverse
    rendering of *vertices* (geometry that moves every step) can re-sort the
    chunks inside the jitted train step instead of silently degrading the
    sweep's chunk tightness with a stale host-built ordering. Shape-static:
    padding repeats the last sorted triangle (duplicates give identical
    nearest hits).
    """
    tv = lax.stop_gradient(tri_vertices)
    n = tv.shape[0]
    if n == 0:
        return jnp.zeros((0,), jnp.int32)
    cent = tv.mean(axis=1).astype(jnp.float32)               # (N,3)
    lo = cent.min(axis=0)
    hi = cent.max(axis=0)
    ext = jnp.maximum(hi - lo, 1e-30)
    q = jnp.clip((cent - lo[None]) / ext[None] * 1023.0, 0.0, 1023.0).astype(jnp.uint32)
    code = (_spread10_jnp(q[:, 0]) | (_spread10_jnp(q[:, 1]) << jnp.uint32(1))
            | (_spread10_jnp(q[:, 2]) << jnp.uint32(2)))
    order = jnp.argsort(code, stable=True).astype(jnp.int32)
    pad = (-n) % chunk_size
    if pad:
        order = jnp.concatenate([order, jnp.broadcast_to(order[-1], (pad,))])
    return order


def resort_chunks(scene: Scene, cfg: RenderConfig) -> Scene:
    """Rebuild the chunk ordering from the CURRENT vertices, on device.

    Safe to call inside jit/grad (topology-only, stop-gradient). Cheap — a
    handful of 10k-element argsorts is noise next to a frame — so
    geometry-optimizing train loops can simply re-sort every step.
    """
    return scene.replace(
        tri_chunk_perm=chunk_perm_split_device(
            scene.tri_vertices,
            effective_chunk_size(cfg, scene.n_triangles)))


def build_chunk_perm_split(tri_vertices, chunk_size: int) -> np.ndarray:
    """Balanced recursive median split on chunk boundaries (host reference).

    Split the (padded) triangle set by centroid along the longest axis of
    the current group's centroid extent; the left part gets floor(k/2)
    chunks (k = group size in chunks), so every leaf is a contiguous
    ``chunk_size`` run of the returned permutation. Nested bisection keeps
    chunk AABBs disjoint-ish and tight — unlike a Morton sort, whose
    Z-order boundary jumps make straddling chunks (~2.6x the total AABB
    surface area on bob; benchmarks/exp_split_build.py).
    """
    tv = np.asarray(tri_vertices, np.float64)
    n = tv.shape[0]
    if n == 0:
        return np.zeros((0,), np.int32)
    cent = tv.mean(axis=1).astype(np.float32)
    ids = np.arange(n)
    pad = (-n) % chunk_size
    if pad:
        ids = np.concatenate([ids, np.repeat(ids[-1], pad)])
    out = []

    def rec(g):
        k = len(g) // chunk_size
        if k <= 1:
            out.append(g)
            return
        c = cent[g]
        ax = int(np.argmax(c.max(0) - c.min(0)))
        order = np.argsort(c[:, ax], kind="stable")
        nl = (k // 2) * chunk_size
        rec(g[order[:nl]])
        rec(g[order[nl:]])

    rec(ids)
    return np.concatenate(out).astype(np.int32)


def chunk_perm_split_device(tri_vertices: Array, chunk_size: int) -> Array:
    """jit-compatible median-split chunk permutation (device build).

    Level-synchronous formulation of ``build_chunk_perm_split``: group
    boundaries are STATIC (sizes depend only on the triangle count), so each
    bisection level is a handful of whole-array ops — per-group extent /
    min / max via ``jax.ops.segment_*`` over a static segment-id array, then
    ONE two-key variadic ``lax.sort`` on ``(group_id, coordinate)``. The
    build is ~log2(n_chunks) sorts of n elements with O(1) HLO ops per level
    (the former per-group ``.at[a:b].set`` loop unrolled O(n_chunks) scatters
    per level — a trace/compile-time balloon for large scenes), and the
    integer major key keeps coordinate resolution independent of group count
    (a float32 composite ``gi + norm`` key quantizes the coordinate once
    groups reach ~2^15). Same shape-static padding contract as
    ``chunk_perm_device``.
    """
    tv = lax.stop_gradient(tri_vertices)
    n = tv.shape[0]
    if n == 0:
        return jnp.zeros((0,), jnp.int32)
    cent_all = tv.mean(axis=1).astype(jnp.float32)
    ids = jnp.arange(n, dtype=jnp.int32)
    pad = (-n) % chunk_size
    if pad:
        ids = jnp.concatenate([ids, jnp.broadcast_to(ids[-1], (pad,))])
    npad = ids.shape[0]
    m = npad // chunk_size
    groups = [(0, m)]                       # (start_chunk, size_chunks)
    while max(k for _, k in groups) > 1:
        g = len(groups)
        seg_np = np.empty((npad,), np.int32)       # static: position -> group
        for gi, (s, k) in enumerate(groups):
            seg_np[s * chunk_size:(s + k) * chunk_size] = gi
        seg = jnp.asarray(seg_np)
        cent = cent_all[ids]                       # (Np, 3) in current order
        ext = (jax.ops.segment_max(cent, seg, num_segments=g)
               - jax.ops.segment_min(cent, seg, num_segments=g))   # (G, 3)
        ax = jnp.argmax(ext, axis=1)                                # (G,)
        coord = jnp.take_along_axis(cent, ax[seg][:, None], axis=1)[:, 0]
        # no per-group normalization needed: the group id is its own sort key
        _, _, ids = lax.sort((seg, coord, ids), dimension=0, num_keys=2,
                             is_stable=True)
        new_groups = []
        for s, k in groups:
            if k <= 1:
                new_groups.append((s, k))
            else:
                nl = k // 2
                new_groups.append((s, nl))
                new_groups.append((s + nl, k - nl))
        groups = new_groups
    return ids.astype(jnp.int32)


def chunk_volume(scene: Scene, cfg: RenderConfig) -> Array:
    """Staleness metric: total chunk-AABB volume under the current ordering.

    Grows as optimization moves vertices away from the ordering's Morton
    locality; compare against the value right after a re-sort to decide when
    to rebuild (or just re-sort every step — see ``resort_chunks``).
    """
    _, lo, hi, _ = _sorted_chunks(scene, cfg)
    return jnp.sum(jnp.prod(hi - lo, axis=-1))


def _sorted_chunks(scene: Scene, cfg: RenderConfig):
    """(M, C, 3, 3) sorted triangle blocks + per-chunk AABBs, stop-gradient.

    AABBs are recomputed from the current vertices each trace, so the accel
    stays valid when vertices move during optimization (only the *ordering*
    is stale, which affects efficiency, never correctness).
    """
    perm = scene.tri_chunk_perm
    if perm is None:
        raise ValueError("scene has no chunk permutation; call accel.with_chunks(scene, cfg)")
    c = effective_chunk_size(cfg, scene.n_triangles)
    tv = lax.stop_gradient(scene.tri_vertices)[perm]        # (M*C, 3, 3)
    m = tv.shape[0] // c
    tvc = tv.reshape(m, c, 3, 3)
    lo = tvc.min(axis=(1, 2))                               # (M, 3)
    hi = tvc.max(axis=(1, 2))
    return tvc, lo, hi, perm


def _slab(ro, rd, lo, hi):
    """Ray/AABB slab test: rays (B,3) vs boxes (M,3) → hit mask (B,M).

    Ref: the grid-bounds slab test, Serial/uniform-grid.cpp:155-197,
    vectorized over rays x boxes with the standard inv-direction form.
    """
    inv = jnp.where(rd != 0.0, 1.0 / jnp.where(rd != 0.0, rd, 1.0), BIG)
    t1 = (lo[None, :, :] - ro[:, None, :]) * inv[:, None, :]
    t2 = (hi[None, :, :] - ro[:, None, :]) * inv[:, None, :]
    tn = jnp.max(jnp.minimum(t1, t2), axis=-1)              # (B,M)
    tf = jnp.min(jnp.maximum(t1, t2), axis=-1)
    return (tf >= jnp.maximum(tn, 0.0)), tn


def _pad_rays(ro, rd, block: int):
    r = ro.shape[0]
    pad = (-r) % block
    if pad:
        ro = jnp.concatenate([ro, jnp.broadcast_to(ro[-1:], (pad, 3))])
        rd = jnp.concatenate([rd, jnp.broadcast_to(rd[-1:], (pad, 3))])
    return ro, rd, r


def closest_triangle(scene: Scene, ro: Array, rd: Array, cfg: RenderConfig):
    """Nearest triangle via the chunk sweep. Returns (t, original_index).

    Per coherent ray block: chunk AABB votes → top-``shortlist`` chunks →
    dense triangle test on the gathered candidates. Exact whenever every
    chunk any block ray hits makes the shortlist (tests compare against
    brute force; the Pallas path is exact by construction).
    """
    tvc, lo, hi, perm = _sorted_chunks(scene, cfg)
    m, c = tvc.shape[0], tvc.shape[1]
    s = min(cfg.shortlist, m)
    block = cfg.ray_block
    ro_p, rd_p, r = _pad_rays(ro, rd, block)
    nb = ro_p.shape[0] // block
    tvf = tvc.reshape(m * c, 3, 3)

    def block_fn(args):
        ro_b, rd_b = args
        hit, _ = _slab(ro_b, rd_b, lo, hi)                  # (B,M)
        votes = jnp.sum(hit, axis=0)                        # (M,)
        _, chunk_ids = lax.top_k(votes, s)                  # (S,)
        cand_idx = (chunk_ids[:, None] * c
                    + jnp.arange(c, dtype=jnp.int32)[None, :]).reshape(-1)  # (S*C,)
        cand = tvf[cand_idx]                                # (S*C,3,3)
        t, _, _ = triangle_test(ro_b, rd_b, cand, cfg.det_epsilon, cfg.smallest_dist)
        amin = jnp.argmin(t, axis=1).astype(jnp.int32)
        tbest = jnp.take_along_axis(t, amin[:, None], 1)[:, 0]
        gidx = perm[cand_idx[amin]]
        return tbest, jnp.where(tbest < BIG, gidx, -1)

    t, idx = lax.map(block_fn, (ro_p.reshape(nb, block, 3), rd_p.reshape(nb, block, 3)))
    return t.reshape(-1)[:r], idx.reshape(-1)[:r]


def any_triangle(scene: Scene, ro: Array, rd: Array, cfg: RenderConfig) -> Array:
    """Occlusion query via the chunk sweep (same shortlist scheme)."""
    t, idx = closest_triangle(scene, ro, rd, cfg)
    return idx >= 0
