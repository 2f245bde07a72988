"""Pallas fused closest-hit kernel: chunk-AABB sweep with MXU triangle tests.

The TPU replacement for the CUDA megakernel's inner loop
(``UniformGrid::intersect`` DDA + ``Triangle::intersect``,
Parellel/structures.cu:237-320 / :115-135). Design:

  * rays live on LANES (tile = 1024 rays per grid step), triangles on
    SUBLANES — every per-ray quantity is a (1, 1024) row, so reductions over
    triangles are cheap sublane reductions and no relayouts are needed;
  * the four Cramer determinants (det, t_num, beta_num, gamma_num) of the
    reference triangle test (Serial/triangle.cpp:10-24) are LINEAR in the
    per-ray feature vector f = [1, ro, rd, rd x ro] — so one chunk of C
    triangles is tested against 1024 rays with ONE MXU matmul
    (4C, FEAT) @ (FEAT, 1024);
  * each ray tile loops only over its COMPACTED visible-chunk list, computed
    vectorized in XLA by a conservative interval-arithmetic slab test (the
    TPU analog of the DDA early-out, Serial/uniform-grid.cpp:251);
  * triangle constants are stored relative to each chunk's centroid and the
    feature vector is re-centered per chunk in-kernel, keeping the f32
    cancellation error at chunk scale instead of scene scale;
  * triangle constants live VMEM-resident (loaded once into persistent
    scratch at grid step 0, full-lane (FEAT, M*4C) layout) for scenes up to
    ~25k triangles; bigger scenes stream per-chunk constants from HBM with
    double-buffered DMA.

The kernel is forward-only (t, index); differentiable hit attributes are
recomputed outside (ops/intersect.closest_hit).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array, lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from realtrace_tpu.core.types import PARK_DISTANCE, RenderConfig, Scene
from realtrace_tpu.ops.intersect import BIG

LANES = 1024          # rays per kernel grid step. Wider steps (2048/4096)
                      # measured NO win: the sweep is epilogue-bound, not
                      # launch-bound, and 2-tile chunk-list unions grow the
                      # visit count (docs/KERNEL.md round-2 findings)
FEAT = 16             # feature rows: [1, ro(3), rd(3), q(3), inv(3), pad(3)]
RESIDENT_LIMIT = 6 * 1024 * 1024  # max B bytes kept VMEM-resident


def _pack_tri_consts(tvc: Array, centroid: Array) -> Array:
    """Per-triangle linear-test constants, chunk-centroid-relative.

    tvc: (M, C, 3, 3) sorted triangle vertices; centroid: (M, 3).
    Returns B: (M, 4C, FEAT) with row groups [det | t_num | beta_num |
    gamma_num] as linear forms over f = [1, ro-G, rd, rd x (ro-G), inv, pad].
    """
    a = tvc[:, :, 0] - centroid[:, None, :]     # (M, C, 3) A' = A - G
    e1 = (tvc[:, :, 0] - tvc[:, :, 1])          # A - B
    e2 = (tvc[:, :, 0] - tvc[:, :, 2])          # A - C
    n = jnp.cross(e1, e2)
    d = jnp.sum(n * a, axis=-1)                 # n . A'
    c1 = jnp.cross(a, e2)                       # A' x e2
    c2 = jnp.cross(e1, a)                       # e1 x A'
    z = jnp.zeros_like(d)
    z3 = jnp.zeros_like(n)

    def rows(w0, w_ro, w_rd, w_q):
        # (M, C, FEAT) linear form: w0 + w_ro.ro' + w_rd.rd + w_q.q'
        # (zero rows for the inv/pad features 10..15)
        return jnp.concatenate([w0[..., None], w_ro, w_rd, w_q, z3, z3], axis=-1)

    b_det = rows(z, z3, n, z3)                  # det      = n . rd
    b_t = rows(d, -n, z3, z3)                   # t_num    = d - n . ro'
    b_beta = rows(z, z3, c1, -e2)               # beta_num = c1 . rd - e2 . q'
    b_gamma = rows(z, z3, c2, e1)               # gamma_num= c2 . rd + e1 . q'
    return jnp.concatenate([b_det, b_t, b_beta, b_gamma], axis=1)  # (M, 4C, FEAT)


def _features(ro: Array, rd: Array) -> Array:
    """Per-ray features, TRANSPOSED layout (FEAT, R): rows
    [1, ro, rd, rd x ro, 1/rd, pad]. Built as a ROW STACK of (R,) vectors:
    a concatenate-then-transpose produced a materialized (R, 16) f32
    intermediate, which lays out T(8,128) (minor dim padded to 128 lanes =
    8x the logical bytes) — measured 3.2ms per secondary-query feature
    build at hit-heavy 1080p (round-4 profile). The stacked (16, R) output
    is sublane-major with zero padding."""
    rox, roy, roz = ro[:, 0], ro[:, 1], ro[:, 2]
    rdx, rdy, rdz = rd[:, 0], rd[:, 1], rd[:, 2]
    qx = rdy * roz - rdz * roy
    qy = rdz * rox - rdx * roz
    qz = rdx * roy - rdy * rox
    inv = [jnp.where(d != 0.0, 1.0 / jnp.where(d != 0.0, d, 1.0), BIG)
           for d in (rdx, rdy, rdz)]
    one = jnp.ones_like(rox)
    pad = jnp.zeros_like(rox)
    rows = [one, rox, roy, roz, rdx, rdy, rdz, qx, qy, qz, *inv] \
        + [pad] * (FEAT - 13)
    return jnp.stack(rows)


def _recenter(a, a2_scratch, m, meta_ref):
    """Write the chunk-centroid-recentered feature rows into a2_scratch:
    ro' = ro - G; q' = q - rd x G (translation-invariant determinants)."""
    gx, gy, gz = meta_ref[m, 0], meta_ref[m, 1], meta_ref[m, 2]
    rdx, rdy, rdz = a[4:5], a[5:6], a[6:7]
    a2_scratch[1:2] = a[1:2] - gx
    a2_scratch[2:3] = a[2:3] - gy
    a2_scratch[3:4] = a[3:4] - gz
    a2_scratch[7:8] = a[7:8] - (rdy * gz - rdz * gy)
    a2_scratch[8:9] = a[8:9] - (rdz * gx - rdx * gz)
    a2_scratch[9:10] = a[9:10] - (rdx * gy - rdy * gx)


def _live_max_t(best_t, parked):
    """Scalar upper bound on any live lane's current nearest hit: parked
    lanes (BIG best_t, never updated) are excluded so they cannot block the
    front-to-back early exit."""
    return jnp.max(jnp.where(parked, 0.0, best_t))


def _reduce_update(p, best_t, best_i, m, c, det_eps, t_min, any_mode):
    """Shared epilogue: validity test + per-ray nearest-hit update from the
    matmul result p (4C, LANES).

    any_mode (occlusion) uses a DIVISION-FREE epilogue: the sign tests
    ``beta>0 ⇔ bnum·det>0`` etc. and ``t>t_min ⇔ tnum·det>t_min·det²`` avoid
    the (C, LANES) reciprocal, and a single OR-reduce replaces min+argmin —
    occlusion only needs "any valid row". (Products of f32s compared to 0
    match the divided forms except when |num| < ~1e-31 underflows — grazing
    cases far below the scene epsilons. The degenerate-det cutoff is det² >=
    eps² — equivalent to |det| >= eps up to one rounding of det², with det²
    underflow only strengthening a rejection that |det| < 1e-19 « eps
    already earns.) The beta+gamma test reuses the bnum·det / gnum·det
    products: (bnum+gnum)·det = m1 + m2."""
    det, tnum = p[0:c], p[c:2 * c]
    bnum, gnum = p[2 * c:3 * c], p[3 * c:4 * c]
    if any_mode:
        det2 = det * det
        m1 = bnum * det
        m2 = gnum * det
        valid = ((det2 >= det_eps * det_eps) & (m1 > 0.0) & (m2 > 0.0)
                 & (m1 + m2 < det2)
                 & (tnum * det > t_min * det2))
        occ = jnp.any(valid, axis=0, keepdims=True)   # (1, LANES)
        return best_t, jnp.where(occ, m * c, best_i)
    ok = jnp.abs(det) >= det_eps
    invd = 1.0 / jnp.where(ok, det, 1.0)
    t = tnum * invd
    beta = bnum * invd
    gamma = gnum * invd
    # (no `t < best_t` term: the `upd = tmin < best_t` test below already
    # enforces it — one fewer (C, LANES) compare+and in the VPU-bound epilogue)
    valid = (ok & (beta > 0.0) & (gamma > 0.0) & (beta + gamma < 1.0)
             & (t > t_min))
    tm = jnp.where(valid, t, BIG)            # (C, LANES)
    tmin = jnp.min(tm, axis=0, keepdims=True)
    amin = jnp.argmin(tm, axis=0, keepdims=True).astype(jnp.int32)
    upd = tmin < best_t
    return (jnp.where(upd, tmin, best_t),
            jnp.where(upd, m * c + amin, best_i))


def _kernel_resident(meta_ref, list_ref, count_ref, entry_ref, feat_ref, b_ref,
                     out_t_ref, out_i_ref, b_vmem, a2_scratch, dma_sem, *,
                     chunk_size: int, det_eps: float, t_min: float,
                     any_mode: bool, precision):
    """VMEM-resident variant: the whole constants table (FEAT, M*4C) is DMA'd
    into persistent scratch once (grid step 0) and lane-sliced per chunk —
    zero per-chunk HBM traffic. The transposed-LHS contraction is a native
    MXU mode (the stationary operand loads transposed for free).

    entry_ref[j] is a lower bound on the entry distance of EVERY listed chunk
    at index >= j (a suffix min — equal to the entry itself when the list is
    front-to-back sorted, as the exact mask produces); the sweep exits as
    soon as that bound exceeds every live lane's nearest hit — the exact
    version of the reference DDA's first-hit-voxel break
    (Serial/uniform-grid.cpp:251). any_mode additionally exits once every
    live lane is occluded (shadow rays want ANY hit, not the nearest)."""
    c = chunk_size
    fc = 4 * c
    a = feat_ref[:]                                  # (FEAT, LANES)
    n = count_ref[0, 0, 0]

    @pl.when(pl.program_id(0) == 0)
    def _():
        cp = pltpu.make_async_copy(b_ref, b_vmem, dma_sem)
        cp.start()
        cp.wait()

    a2_scratch[0:1] = a[0:1]
    a2_scratch[4:7] = a[4:7]
    a2_scratch[10:FEAT] = jnp.zeros((FEAT - 10, LANES), jnp.float32)
    parked = a[1:2] == PARK_DISTANCE                 # (1, LANES) dead lanes

    def cond(carry):
        return carry[0]

    def body(carry):
        _, j, best_t, best_i = carry
        m = list_ref[0, 0, j]
        _recenter(a, a2_scratch, m, meta_ref)
        off = pl.multiple_of(m * fc, fc)
        bm = b_vmem[:, pl.ds(off, fc)]               # (FEAT, 4C) lane slice
        p = lax.dot_general(bm, a2_scratch[:], (((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=precision)      # (4C, LANES)
        best_t, best_i = _reduce_update(p, best_t, best_i, m, c, det_eps,
                                        t_min, any_mode)
        nj = j + 1
        if any_mode:
            # any-mode never updates best_t, so the front-to-back entry
            # bound can't trigger — only the all-occluded exit applies
            go = (nj < n) & ~jnp.all(parked | (best_i >= 0))
        else:
            jc = jnp.minimum(nj, n - 1)
            go = (nj < n) & (entry_ref[0, 0, jc] <= _live_max_t(best_t, parked))
        return go, nj, best_t, best_i

    init = (n > 0, jnp.zeros((), n.dtype),
            jnp.full((1, LANES), BIG, jnp.float32),
            jnp.full((1, LANES), -1, jnp.int32))
    _, _, best_t, best_i = lax.while_loop(cond, body, init)
    out_t_ref[0] = best_t
    out_i_ref[0] = best_i


def _kernel_stream(meta_ref, list_ref, count_ref, entry_ref, feat_ref, b_ref,
                   out_t_ref, out_i_ref, b_scratch, a2_scratch, dma_sems, *,
                   chunk_size: int, det_eps: float, t_min: float,
                   any_mode: bool, precision):
    """Streaming variant for scenes too big for VMEM: per-chunk (FEAT, 4C)
    constants double-buffer-DMA'd from HBM, prefetch overlapping the matmul.

    The per-chunk slices use the SAME transposed-LHS layout as the resident
    table — (FEAT, 4C), lane dim 4C, zero padding — so each visit moves
    exactly 16KB (c=64) instead of the former (4C, FEAT_PAD=128) layout's
    131KB (the f32 lane padding made every fetch 8x its useful bytes; the
    round-4 bob x4 capture was DMA-bound at 15.2 Mrays/s because of it).
    The transposed contraction is the native MXU mode the resident kernel
    already uses.

    Has the SAME front-to-back early exit as the resident kernel (the
    big-scene case is exactly where skipping far chunks matters most): the
    prefetch runs one chunk ahead of the compute, so an early exit wastes at
    most the single in-flight fetch, which the epilogue drains."""
    c = chunk_size
    fc = 4 * c
    a = feat_ref[:]
    n = count_ref[0, 0, 0]

    a2_scratch[0:1] = a[0:1]
    a2_scratch[4:7] = a[4:7]
    a2_scratch[10:FEAT] = jnp.zeros((FEAT - 10, LANES), jnp.float32)
    parked = a[1:2] == PARK_DISTANCE                 # (1, LANES) dead lanes

    def start_fetch(j, slot):
        # unconditional (index clamped): one redundant fetch past the end
        # beats a conditional DMA start
        jc = jnp.minimum(j, jnp.maximum(n - 1, 0))
        m = list_ref[0, 0, jc]
        pltpu.make_async_copy(b_ref.at[m], b_scratch.at[slot],
                              dma_sems.at[slot]).start()

    @pl.when(n > 0)
    def _():
        start_fetch(jnp.asarray(0, n.dtype), jnp.asarray(0, n.dtype))

    def cond(carry):
        return carry[0]

    def body(carry):
        _, j, best_t, best_i = carry
        two = jnp.asarray(2, j.dtype)
        slot = lax.rem(j, two)
        m = list_ref[0, 0, j]
        start_fetch(j + 1, lax.rem(j + 1, two))      # prefetch next chunk
        _recenter(a, a2_scratch, m, meta_ref)
        pltpu.make_async_copy(b_ref.at[m], b_scratch.at[slot],
                              dma_sems.at[slot]).wait()
        bm = b_scratch[slot]                         # (FEAT, 4C)
        p = lax.dot_general(bm, a2_scratch[:], (((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=precision)     # (4C, LANES)
        best_t, best_i = _reduce_update(p, best_t, best_i, m, c, det_eps,
                                        t_min, any_mode)
        nj = j + 1
        if any_mode:
            # any-mode never updates best_t — only the all-occluded exit
            go = (nj < n) & ~jnp.all(parked | (best_i >= 0))
        else:
            jc = jnp.minimum(nj, n - 1)
            go = (nj < n) & (entry_ref[0, 0, jc] <= _live_max_t(best_t, parked))
        return go, nj, best_t, best_i

    init = (n > 0, jnp.zeros((), n.dtype),
            jnp.full((1, LANES), BIG, jnp.float32),
            jnp.full((1, LANES), -1, jnp.int32))
    _, j_exit, best_t, best_i = lax.while_loop(cond, body, init)

    @pl.when(n > 0)
    def _():
        # drain the one outstanding prefetch: the last body iteration started
        # a fetch for chunk min(j_exit, n-1) into slot j_exit % 2
        jc = jnp.minimum(j_exit, jnp.maximum(n - 1, 0))
        m = list_ref[0, 0, jc]
        sl = lax.rem(j_exit, jnp.asarray(2, n.dtype))
        pltpu.make_async_copy(b_ref.at[m], b_scratch.at[sl],
                              dma_sems.at[sl]).wait()

    out_t_ref[0] = best_t
    out_i_ref[0] = best_i


_PRECISIONS = {"default": lax.Precision.DEFAULT, "high": lax.Precision.HIGH,
               "highest": lax.Precision.HIGHEST}



@functools.partial(jax.jit, static_argnames=("chunk_size", "det_eps", "t_min",
                                             "interpret", "any_mode", "precision",
                                             "resident"))
def _sweep(meta, chunk_list, counts, entry, feat, b, chunk_size: int,
           det_eps: float, t_min: float, interpret: bool, any_mode: bool = False,
           precision: str = "highest", resident: bool = True):
    nt = feat.shape[1] // LANES
    m = chunk_list.shape[-1]
    fc = 4 * chunk_size
    if resident:
        kern = functools.partial(_kernel_resident, chunk_size=chunk_size,
                                 det_eps=det_eps, t_min=t_min, any_mode=any_mode,
                                 precision=_PRECISIONS[precision])
        scratch = [
            pltpu.VMEM((FEAT, m * fc), jnp.float32),   # persistent B table
            pltpu.VMEM((FEAT, LANES), jnp.float32),    # recentered features
            pltpu.SemaphoreType.DMA,
        ]
    else:
        kern = functools.partial(_kernel_stream, chunk_size=chunk_size,
                                 det_eps=det_eps, t_min=t_min, any_mode=any_mode,
                                 precision=_PRECISIONS[precision])
        scratch = [
            pltpu.VMEM((2, FEAT, fc), jnp.float32),    # DMA double buffer
            pltpu.VMEM((FEAT, LANES), jnp.float32),    # recentered features
            pltpu.SemaphoreType.DMA((2,)),
        ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nt,),
        in_specs=[
            # per-tile compacted visible-chunk list + count, scalar-readable
            # (3D so the trailing block dims equal the array dims)
            pl.BlockSpec((1, 1, m), lambda i, *_: (i, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 1), lambda i, *_: (i, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, m), lambda i, *_: (i, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((FEAT, LANES), lambda i, *_: (0, i)),
            pl.BlockSpec(memory_space=pl.ANY),   # tri consts stay in HBM
        ],
        scratch_shapes=scratch,
        out_specs=[
            pl.BlockSpec((1, 1, LANES), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, 1, LANES), lambda i, *_: (i, 0, 0)),
        ],
    )
    t, idx = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((nt, 1, LANES), jnp.float32),
            jax.ShapeDtypeStruct((nt, 1, LANES), jnp.int32),
        ],
        interpret=interpret,
    )(meta, chunk_list, counts, entry, feat, b)
    return t.reshape(nt, LANES), idx.reshape(nt, LANES)


def _chunk_mask(ro, rd, lo, hi, nt):
    """Conservative per-tile chunk visibility via OCTANT-SPLIT interval
    arithmetic.

    Bound each tile's rays by [ro_min, ro_max] x [inv_min, inv_max] intervals
    PER DIRECTION OCTANT (8 sign patterns of rd) and interval-evaluate the
    slab test per (tile, octant, chunk); a chunk is visible if any octant's
    test passes. Sign-consistent inv intervals keep the slab products
    meaningful after a bounce — a tile whose reflections straddle an axis
    otherwise degenerates to [inv_min<0<inv_max] and admits ~everything
    (measured: bounce-1 mean chunks/tile 3.2 -> 1.6 on the 1080p headline,
    15.6 -> 9.3 on the hit-heavy close framing, at equal cost — the per-lane
    reductions dominate, not the 8x (nt, M) slab math). Never excludes a
    chunk any tile ray could hit (exactness comes from the in-kernel test).

    Lists are compacted front-to-back by the per-(tile,octant) entry bound —
    the sorted order is what lets the kernel's early exit consume near
    chunks first (entry[j] then bounds every remaining chunk). Parked lanes
    are excluded from the intervals.

    Returns (chunk_list (nt,1,M) i32, entry (nt,1,M) f32, counts (nt,1,1)).
    """
    inv = jnp.where(rd != 0.0, 1.0 / jnp.where(rd != 0.0, rd, 1.0), BIG)
    ro_t = ro.reshape(nt, LANES, 3)
    inv_t = inv.reshape(nt, LANES, 3)
    live = ro_t[..., 0] != PARK_DISTANCE                           # (nt,LANES)
    oct_id = ((inv_t[..., 0] < 0).astype(jnp.int8)
              + 2 * (inv_t[..., 1] < 0).astype(jnp.int8)
              + 4 * (inv_t[..., 2] < 0).astype(jnp.int8))          # (nt,LANES)
    mask = None
    entry = None
    for o in range(8):
        sel = (live & (oct_id == o))[..., None]                    # (nt,LANES,1)
        any_o = jnp.any(sel[..., 0], axis=1)                       # (nt,)
        ro_lo = jnp.where(sel, ro_t, BIG).min(1)[:, None]          # (nt,1,3)
        ro_hi = jnp.where(sel, ro_t, -BIG).max(1)[:, None]
        inv_lo = jnp.where(sel, inv_t, BIG).min(1)[:, None]
        inv_hi = jnp.where(sel, inv_t, -BIG).max(1)[:, None]

        def plane_interval(p):
            # interval for (p - ro) * inv, p: (M,3)
            a_lo = p[None] - ro_hi                                 # (nt,M,3)
            a_hi = p[None] - ro_lo
            cands = jnp.stack([a_lo * inv_lo, a_lo * inv_hi,
                               a_hi * inv_lo, a_hi * inv_hi])
            return cands.min(0), cands.max(0)

        ta_lo, ta_hi = plane_interval(lo)
        tb_lo, tb_hi = plane_interval(hi)
        tn_lo = jnp.minimum(ta_lo, tb_lo).max(-1)    # (nt,M) optimistic entry
        tf_hi = jnp.maximum(ta_hi, tb_hi).min(-1)    # optimistic exit
        e = jnp.maximum(tn_lo, 0.0)
        # same relative pad as the exact mask, so the exact mask (gated by
        # this list) can never be the stricter of the two on a grazing chunk
        m_o = (tf_hi * (1.0 + 1e-6) + 1e-6 >= e) & any_o[:, None]
        e = jnp.where(m_o, e, BIG)
        mask = m_o if mask is None else (mask | m_o)
        entry = e if entry is None else jnp.minimum(entry, e)
    return _compact_front_to_back(mask, entry)


def _compact_front_to_back(mask, entry):
    """(chunk_list, entry, counts): visible chunks first, sorted FRONT-TO-BACK
    by entry bound so the kernel consumes near chunks first and can stop once
    the next entry exceeds every live lane's nearest hit (ordering never
    affects results). ONE variadic lax.sort carries ids and entries together —
    argsort + take_along_axis cost an extra ~4.5ms/frame in slow scalar-space
    gathers at 1080p."""
    nt, m = mask.shape
    key = jnp.where(mask, entry, jnp.inf)
    ids = jnp.broadcast_to(jnp.arange(m, dtype=jnp.int32)[None], (nt, m))
    entry_pay = jnp.where(mask, entry, 0.0)
    _, order, entry_sorted = lax.sort((key, ids, entry_pay), dimension=1,
                                      num_keys=1, is_stable=True)
    counts = jnp.sum(mask, axis=1, dtype=jnp.int32)
    return order[:, None, :], entry_sorted[:, None, :], counts[:, None, None]


EXACT_MASK_BLOCK_TILES = 32   # tiles per lax.map step: bounds the per-ray
                              # slab temporaries to ~50MB at the gate cap
EXACT_GATE_CAP = 96           # interval-shortlist candidates refined per-ray
                              # per tile; the (rare) interval tail beyond the
                              # cap is kept conservatively un-refined
# ---- super-chunk level (big scenes; VERDICT r4 #3) ------------------------
# Group SUPER_GROUP consecutive sorted-space chunks (the median-split order
# is spatially coherent) into one super-chunk AABB and test THOSE per-ray
# before the capped chunk refinement: the per-ray stage then covers the FULL
# chunk range at ~1/G the cost, so visit lists stop being dominated by the
# un-refined interval tail once chunk counts outgrow EXACT_GATE_CAP
# (bob x4: 668 chunks, interval lists mean 199/tile, super-gated+refined 86,
# uncapped per-ray oracle 42 — measured at 480x272, /tmp-experiment r5).
# G doubles until supers fit a ~128-wide per-ray stage.
SUPER_GROUP = 8
SUPER_STAGE_WIDTH = 128       # target upper bound on the super count
# TRIANGLE count at which the big-scene mask policy engages (full-width
# EXACT mask + super-chunk gate): set by measurement, 2026-08-21 session —
# bob x8 (85.5k tris) 4.6 -> 5.9 Mrays/s with the gated mask at EVERY chunk
# size tried (64/128/256), while bob x4 (42.7k) measured 15.6 gated vs 16.3
# interval and the flagship bob configs must stay bit-for-bit. Chunk count
# is NOT the predictor (334 chunks wins at x8, loses at x4 — the payoff
# scales with per-ray geometry crossings, which track triangles).
EXACT_MASK_MIN_TRIS = 1 << 16


def _super_bounds(lo, hi):
    """(lo_s, hi_s, G): super-chunk AABBs over groups of G consecutive
    sorted-space chunks (degenerate padding for the ragged tail)."""
    m = lo.shape[0]
    g = SUPER_GROUP
    while -(-m // g) > SUPER_STAGE_WIDTH:
        g *= 2
    s = -(-m // g)
    pad = s * g - m
    if pad:
        lo = jnp.concatenate([lo, jnp.full((pad, 3), BIG, lo.dtype)])
        hi = jnp.concatenate([hi, jnp.full((pad, 3), -BIG, hi.dtype)])
    return lo.reshape(s, g, 3).min(1), hi.reshape(s, g, 3).max(1), g


def _super_tile_mask(ro, rd, lo_s, hi_s, nt):
    """Per-tile super-chunk visibility from PER-RAY slab tests (OR over each
    tile's live lanes), blockwise to bound temporaries. Conservative for any
    chunk in the super (chunk AABB ⊂ super AABB ⇒ ray misses super ⇒ misses
    every chunk inside). Returns (nt, S) bool."""
    s = lo_s.shape[0]
    bt = min(EXACT_MASK_BLOCK_TILES, nt)
    nb = -(-nt // bt)
    pad_t = nb * bt - nt
    if pad_t:
        ro = jnp.concatenate([ro, jnp.full((pad_t * LANES, 3), PARK_DISTANCE,
                                           ro.dtype)])
        rd = jnp.concatenate([rd, jnp.ones((pad_t * LANES, 3), rd.dtype)])

    def block(args):
        ro_b, rd_b = args
        inv = jnp.where(rd_b != 0.0, 1.0 / jnp.where(rd_b != 0.0, rd_b, 1.0),
                        BIG)
        live = ro_b[:, 0] != PARK_DISTANCE
        tn = jnp.zeros((bt * LANES, s), jnp.float32)
        tf = jnp.full((bt * LANES, s), BIG, jnp.float32)
        for ax in range(3):
            t1 = (lo_s[None, :, ax] - ro_b[:, None, ax]) * inv[:, None, ax]
            t2 = (hi_s[None, :, ax] - ro_b[:, None, ax]) * inv[:, None, ax]
            tn = jnp.maximum(tn, jnp.minimum(t1, t2))
            tf = jnp.minimum(tf, jnp.maximum(t1, t2))
        hit = (tf * (1.0 + 1e-6) + 1e-6 >= tn) & live[:, None]
        return jnp.any(hit.reshape(bt, LANES, s), axis=1)

    sup = lax.map(block, (ro.reshape(nb, bt * LANES, 3),
                          rd.reshape(nb, bt * LANES, 3)))
    return sup.reshape(nb * bt, s)[:nt]


def _chunk_mask_exact(ro, rd, lo, hi, nt, super_gate: bool = False):
    """EXACT per-tile chunk visibility: per-ray slab test, OR-reduced over
    each tile's lanes. Decisive wherever the interval mask is loose:
    divergent reflections (the [inv_min, inv_max] box spans sign changes and
    degenerates to ~everything — measured 61-95 of 167 chunks/tile on bob
    bounce levels) AND close framings (hit-heavy shadow/child unions shrink
    to ~0.4x/0.47x of the octant-interval lists, benchmarks/exp_mask_stats).

    TWO-LEVEL: the octant-interval mask (cheap, O(tiles x chunks)) first
    shortlists each tile's candidate chunks; the per-ray slab test then runs
    ONLY over the first EXACT_GATE_CAP shortlisted chunks — O(rays x cap)
    instead of O(rays x chunks). At hit-heavy 1080p widths the interval
    shortlist means ~16 of 334 chunks/tile, so the refinement is ~4-5x
    cheaper than the full-table slab sweep at identical output (the interval
    mask is a conservative superset, so gating by it drops nothing; a tile
    whose shortlist overflows the cap keeps its un-refined tail). Tile
    BLOCKS stream through lax.map (EXACT_MASK_BLOCK_TILES per step) to bound
    the (rays, cap) temporaries.

    Never excludes a chunk any lane's forward half-line enters (triangle ⊂
    chunk AABB ⇒ any triangle hit implies a slab hit). Same compacted-list
    (chunk_list, entry, counts) contract as ``_chunk_mask``; the per-tile
    entry bound (min over hitting lanes of the slab entry) is tighter, which
    also sharpens the kernel's front-to-back early exit.
    """
    m = lo.shape[0]
    k = min(EXACT_GATE_CAP, m)
    ids_i, entry_i, counts_i = _chunk_mask(ro, rd, lo, hi, nt)
    ids_i = ids_i[:, 0, :]                   # (nt, M) front-to-back chunk ids
    entry_i = entry_i[:, 0, :]               # (nt, M) interval entry bounds
    counts_i = counts_i[:, 0, 0]             # (nt,)

    if super_gate and m >= 64:
        # ---- super-chunk gate: per-ray slab verdicts at 1/G granularity
        # cover the FULL chunk range (the capped refinement below only sees
        # the first k candidates); gate the interval list and re-compact so
        # surviving chunks fill the refinement window front-to-back
        lo_s, hi_s, g = _super_bounds(lo, hi)
        sup = _super_tile_mask(ro, rd, lo_s, hi_s, nt)           # (nt, S)
        pos = jnp.arange(ids_i.shape[1], dtype=jnp.int32)[None, :]
        keep = ((pos < counts_i[:, None])
                & jnp.take_along_axis(sup, ids_i // g, axis=1))
        key = jnp.where(keep, entry_i, jnp.inf)
        _, ids_i, entry_i = lax.sort(
            (key, ids_i, jnp.where(keep, entry_i, 0.0)),
            dimension=1, num_keys=1, is_stable=True)
        counts_i = jnp.sum(keep, axis=1, dtype=jnp.int32)

    bt = min(EXACT_MASK_BLOCK_TILES, nt)
    nb = -(-nt // bt)
    pad_t = nb * bt - nt
    if pad_t:   # pad with parked tiles (live=False → empty lists)
        ro = jnp.concatenate([ro, jnp.full((pad_t * LANES, 3), PARK_DISTANCE,
                                           ro.dtype)])
        rd = jnp.concatenate([rd, jnp.ones((pad_t * LANES, 3), rd.dtype)])
    cand = ids_i[:, :k]                                        # (nt, k)
    lo_c = lo[cand]                                            # (nt, k, 3)
    hi_c = hi[cand]
    cnt = jnp.minimum(counts_i, k)
    if pad_t:
        lo_c = jnp.concatenate([lo_c, jnp.zeros((pad_t, k, 3), lo_c.dtype)])
        hi_c = jnp.concatenate([hi_c, jnp.zeros((pad_t, k, 3), hi_c.dtype)])
        cnt = jnp.concatenate([cnt, jnp.zeros((pad_t,), cnt.dtype)])

    def block(args):
        ro_b, rd_b, lo_b, hi_b, cnt_b = args   # (bt*LANES,3) x2, (bt,k,3) x2, (bt,)
        inv = jnp.where(rd_b != 0.0, 1.0 / jnp.where(rd_b != 0.0, rd_b, 1.0), BIG)
        live = (ro_b[:, 0] != PARK_DISTANCE).reshape(bt, LANES)
        ro_t = ro_b.reshape(bt, LANES, 3)
        inv_t = inv.reshape(bt, LANES, 3)
        tn = jnp.zeros((bt, LANES, k), jnp.float32)            # entry ≥ 0
        tf = jnp.full((bt, LANES, k), BIG, jnp.float32)
        for ax in range(3):
            t1 = ((lo_b[:, None, :, ax] - ro_t[:, :, None, ax])
                  * inv_t[:, :, None, ax])
            t2 = ((hi_b[:, None, :, ax] - ro_t[:, :, None, ax])
                  * inv_t[:, :, None, ax])
            tn = jnp.maximum(tn, jnp.minimum(t1, t2))
            tf = jnp.minimum(tf, jnp.maximum(t1, t2))
        # small relative pad so f32 rounding can't drop a grazing chunk
        hit = ((tf * (1.0 + 1e-6) + 1e-6 >= tn) & live[:, :, None]
               & (jnp.arange(k)[None, None, :] < cnt_b[:, None, None]))
        mask_b = jnp.any(hit, axis=1)                          # (bt, k)
        entry_b = jnp.min(jnp.where(hit, tn, jnp.inf), axis=1)
        return mask_b, jnp.where(mask_b, entry_b, 0.0)

    mask_k, entry_k = lax.map(block, (ro.reshape(nb, bt * LANES, 3),
                                      rd.reshape(nb, bt * LANES, 3),
                                      lo_c.reshape(nb, bt, k, 3),
                                      hi_c.reshape(nb, bt, k, 3),
                                      cnt.reshape(nb, bt)))
    mask_k = mask_k.reshape(nb * bt, k)[:nt]
    entry_k = entry_k.reshape(nb * bt, k)[:nt]

    # assemble position-space mask/entry over the interval list: positions
    # < k are the per-ray-refined verdicts; k <= pos < count is the
    # conservative un-refined interval tail
    pos = jnp.arange(ids_i.shape[1], dtype=jnp.int32)[None, :]
    tail = (pos >= k) & (pos < counts_i[:, None])
    mask = jnp.concatenate(
        [mask_k, jnp.zeros((nt, ids_i.shape[1] - k), bool)], axis=1) | tail
    entry = jnp.where(
        pos < k,
        jnp.concatenate([entry_k, jnp.zeros((nt, ids_i.shape[1] - k),
                                            jnp.float32)], axis=1),
        entry_i)
    # re-compact front-to-back (same variadic-sort shape as
    # _compact_front_to_back, but ids are the gathered chunk ids, not arange)
    key = jnp.where(mask, entry, jnp.inf)
    _, ids_out, entry_out = lax.sort((key, ids_i, jnp.where(mask, entry, 0.0)),
                                     dimension=1, num_keys=1, is_stable=True)
    counts = jnp.sum(mask, axis=1, dtype=jnp.int32)
    return ids_out[:, None, :], entry_out[:, None, :], counts[:, None, None]


class AccelPack:
    """Scene-constant sweep inputs, built ONCE per frame and threaded through
    every closest/occlusion query (8+ sweeps per frame would otherwise each
    recompute ~6ms of packing at 1080p)."""

    def __init__(self, b, meta, lo, hi, perm, resident: bool, chunk_size: int):
        self.b = b            # constants table (layout depends on `resident`)
        self.meta = meta      # (M, 3) chunk centroids
        self.lo = lo          # (M, 3) chunk AABB mins
        self.hi = hi          # (M, 3) chunk AABB maxs
        self.perm = perm      # (M*C,) sorted->original triangle index
        self.resident = resident
        self.chunk_size = chunk_size
        self.scene_lo = lo.min(axis=0)   # scene AABB
        self.scene_hi = hi.max(axis=0)
        self.any_pack: "AccelPack | None" = None   # optional any-mode variant


def _pack_for(perm, tri_vertices, c: int) -> AccelPack:
    """AccelPack at chunk size ``c`` from a sorted triangle permutation
    (padded here to a multiple of ``c`` by repeating the last triangle)."""
    f32 = jnp.float32
    pad = (-perm.shape[0]) % c
    if pad:
        perm = jnp.concatenate([perm, jnp.broadcast_to(perm[-1], (pad,))])
    tv = lax.stop_gradient(tri_vertices).astype(f32)[perm]
    m = tv.shape[0] // c
    tvc = tv.reshape(m, c, 3, 3)
    lo = tvc.min(axis=(1, 2))
    hi = tvc.max(axis=(1, 2))
    centroid = 0.5 * (lo + hi)
    b = _pack_tri_consts(tvc, centroid)                       # (M, 4C, FEAT)
    # resident lane slices must be provably 128-aligned → need 4C % 128 == 0
    resident = (m * 4 * c * FEAT * 4) <= RESIDENT_LIMIT and (4 * c) % 128 == 0
    if resident:
        # full-lane (FEAT, M*4C) layout: no tile-padding waste in VMEM
        b = b.transpose(2, 0, 1).reshape(FEAT, m * 4 * c)
    else:
        # streaming layout: per-chunk (FEAT, 4C) transposed-LHS slices —
        # lane dim 4C, zero padding, 16KB/visit at c=64 (the former
        # (4C, FEAT_PAD=128) layout DMA'd 8x the useful bytes per visit)
        b = b.transpose(0, 2, 1)                              # (M, FEAT, 4C)
    return AccelPack(b, centroid, lo, hi, perm, resident, c)


def build_pack(scene: Scene, cfg: RenderConfig) -> AccelPack:
    """Precompute the sweep's scene-constant inputs (stop-gradient).

    (A round-4 experiment attached a second coarser-chunk pack for any-mode
    sweeps via ``pack.any_pack`` — measured a loser on every framing, see
    benchmarks/exp_shadow64.py and the RenderConfig note; the hook remains
    for experiments but no cfg knob sets it.)"""
    perm = scene.tri_chunk_perm
    if perm is None:
        raise ValueError("scene has no chunk permutation; call accel.with_chunks(scene, cfg)")
    from realtrace_tpu.ops.accel import effective_chunk_size
    return _pack_for(perm, scene.tri_vertices,
                     effective_chunk_size(cfg, scene.n_triangles))


def closest_triangle(scene: Scene, ro: Array, rd: Array, cfg: RenderConfig,
                     any_mode: bool = False, pack: AccelPack | None = None,
                     raw_idx: bool = False, feat: Array | None = None,
                     exact_mask: bool | None = None):
    """accel-API entry: nearest triangle (t, index) via the Pallas chunk
    sweep. Forward-only (callers stop gradients). ``any_mode`` turns the
    query into first-hit occlusion (shadow rays). ``raw_idx`` returns the
    SORTED-space index (for callers that gather from a sorted table), which
    skips a 20ms/2M-ray permutation gather; default is the original index.
    ``feat`` optionally supplies the (FEAT, R) feature matrix prebuilt in row
    layout (see render/pipeline._primary_features) — skips ``_features``'s
    full-wavefront transpose. ``exact_mask`` forces the exact per-ray chunk
    mask on (True) or off (False); None keeps the width heuristic — callers
    know which wavefronts the interval mask serves poorly (secondary rays,
    close framings; see benchmarks/exp_mask_stats.py).
    """
    if pack is None:
        pack = build_pack(scene, cfg)
    if any_mode and pack.any_pack is not None:
        pack = pack.any_pack          # occlusion sweeps at their own chunk size
    c = pack.chunk_size
    f32 = jnp.float32
    b, meta, lo, hi, perm = pack.b, pack.meta, pack.lo, pack.hi, pack.perm
    resident = pack.resident

    r = ro.shape[0]
    pad_n = (-r) % LANES
    if pad_n:  # padding lanes are parked (zero accel work)
        ro32 = jnp.concatenate([ro.astype(f32), jnp.full((pad_n, 3), PARK_DISTANCE, f32)])
        rd32 = jnp.concatenate([rd.astype(f32), jnp.ones((pad_n, 3), f32)])
    else:
        ro32, rd32 = ro.astype(f32), rd.astype(f32)
    if feat is None:
        feat = _features(ro32, rd32)                          # (FEAT, R')
    else:
        assert feat.shape == (FEAT, ro32.shape[0]), (feat.shape, ro32.shape)
        feat = feat.astype(f32)
    nt = feat.shape[1] // LANES
    # exact per-ray masks for compacted (secondary) widths, interval masks
    # for full-width primary wavefronts where the interval lists are already
    # tight; callers override via ``exact_mask``. BIG scenes (triangle count
    # >= EXACT_MASK_MIN_TRIS) take the exact mask at ANY width WITH the
    # super-chunk gate: measured bob x8 4.6 -> 5.9 Mrays/s (see the
    # threshold comment above; bob x4 and below keep interval primaries).
    big = lo.shape[0] * c >= EXACT_MASK_MIN_TRIS
    if exact_mask is None:
        exact_mask = ro32.shape[0] <= cfg.exact_mask_rays or big
    mask_fn = (functools.partial(_chunk_mask_exact, super_gate=big)
               if exact_mask else _chunk_mask)
    chunk_list, entry, counts = mask_fn(ro32, rd32, lo, hi, nt)

    interpret = jax.default_backend() == "cpu"
    t, idx = _sweep(meta, chunk_list, counts, entry, feat, b, c,
                    float(cfg.det_epsilon), float(cfg.smallest_dist),
                    interpret, any_mode,
                    (cfg.occlusion_precision if any_mode
                     else cfg.matmul_precision), resident)
    t = t.reshape(-1)[:r].astype(ro.dtype)
    idx = idx.reshape(-1)[:r]
    t = jnp.where(idx >= 0, t, BIG)
    if raw_idx:
        return t, idx
    orig = jnp.where(idx >= 0, perm[jnp.maximum(idx, 0)], -1)
    return t, orig


def any_triangle(scene: Scene, ro: Array, rd: Array, cfg: RenderConfig,
                 pack: AccelPack | None = None,
                 exact_mask: bool | None = None) -> Array:
    # raw indices: occlusion only needs idx >= 0, the perm map would be waste
    t, idx = closest_triangle(scene, ro, rd, cfg, any_mode=True, pack=pack,
                              raw_idx=True, exact_mask=exact_mask)
    return idx >= 0
