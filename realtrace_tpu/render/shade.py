"""Wavefront Whitted shading: the reference's recursive ``World::shade_ray``
(Serial/world.cpp:32-111) flattened into dense per-level wavefront steps.

Recursion → iteration: each bounce level processes ALL pixel rays as one dense
batch — a constant-lane ``lax.scan`` in the no-dielectric case, and a flat
2W-wide (reflect ‖ refract) compacted wavefront with per-lane pixel-slot
scatter for dielectric scenes — generalizing the CUDA reference's static
depth-2 / 7-buffer wavefront scheduler (Parellel/kernel.cu:564-604). Within a
level dead rays are masked/parked, never compacted mid-level; between levels
the wavefront shrinks to hit tiles (and, for dielectrics, to live children) by
shape-static gathers (SURVEY §7 hard part (b)).

All steps are differentiable; discrete decisions (hit selection, shadowing,
material branch) are held fixed via stop_gradient inside closest_hit/any_hit.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import Array, lax

from realtrace_tpu.core import vec
from realtrace_tpu.core.types import (PARK_DISTANCE, WAVEFRONT_TILE,
                                      RenderConfig, Scene)
from realtrace_tpu.ops.intersect import (FAM_NONE, Hit, any_hit, closest_hit,
                                         closest_query, hit_attributes)


def phong_pow(d: Array, e: int) -> Array:
    """max(pow(d, e), 0) with C ``pow`` semantics for negative bases:
    even exponent → |d|^e (always ≥ 0), odd → clamped at 0.
    Ref: Serial/world.cpp:134 uses pow(·,128) (even) inside a max().
    """
    if e % 2 == 0:
        return jnp.abs(d) ** e
    return jnp.maximum(d, 0.0) ** e


def light_shade(position: Array, normal: Array, view: Array, color: Array,
                kd: Array, ks: Array, scene: Scene, cfg: RenderConfig) -> Array:
    """Sum of Phong diffuse+specular over all lights.

    Ref: World::get_light_shade, Serial/world.cpp:126-137. ``legacy_diffuse``
    reproduces the reference quirk of lighting by ``normalize(lightPosition)``
    (origin-relative) instead of the surface→light direction.
    """
    n = vec.normalize(normal)                              # (R,3)
    lp = scene.lights.position                             # (L,3)
    li = scene.lights.intensity                            # (L,3)
    to_light = lp[None, :, :] - position[:, None, :]       # (R,L,3)
    l_dir = vec.normalize(to_light)
    refl = vec.normalize(vec.reflect(-l_dir, n[:, None, :]))
    if cfg.legacy_diffuse:
        diff_dir = vec.normalize(lp)[None, :, :]           # normalize(lightPosition)
    else:
        diff_dir = l_dir
    diffuse = jnp.maximum(vec.dot(n[:, None, :], diff_dir), 0.0)      # (R,L)
    spec = phong_pow(vec.dot(vec.normalize(view)[:, None, :], refl), cfg.phong_exp)
    out = (kd[:, None, None] * diffuse[..., None] * li[None] * color[:, None, :]
           + ks[:, None, None] * spec[..., None] * li[None])
    return jnp.sum(out, axis=1)                            # (R,3)


def _park_dead(ro: Array, rd: Array, live: Array) -> tuple[Array, Array]:
    """Replace dead lanes' rays with a guaranteed-miss ray far outside the
    scene, pointing away. The wavefront stays dense (no compaction — SURVEY
    §7 hard part (b)) but the accel's chunk-visibility mask then assigns dead
    lanes zero intersection work."""
    park_o = jnp.full_like(ro, PARK_DISTANCE)
    park_d = jnp.zeros_like(rd).at[..., 0].set(1.0)
    return (jnp.where(live[:, None], ro, park_o),
            jnp.where(live[:, None], rd, park_d))


def _shadow_targets(scene: Scene, hit_pos: Array, live: Array, cfg: RenderConfig):
    """Per-light shadow ray (origin, direction), parked on dead lanes.

    Ref: Serial/world.cpp:42-51 — shadow ray origin is offset by
    ``0.01*(lightPos-pos)`` along the *unnormalized* to-light vector.
    """
    out = []
    lp = scene.lights.position
    for l in range(lp.shape[0]):
        to_light = lp[l][None, :] - hit_pos
        origin = hit_pos + cfg.shadow_origin_bias * to_light
        direction = vec.normalize(to_light)
        out.append(_park_dead(origin, direction, live))
    return out


def shadow_mask(scene: Scene, hit_pos: Array, live: Array, cfg: RenderConfig,
                pack=None) -> Array:
    """True where ANY light's shadow ray is occluded.

    Ref: Serial/world.cpp:42-51 — any hit (even beyond the light) counts as
    shadow, which we reproduce.
    """
    occ = jnp.zeros((hit_pos.shape[0],), bool)
    for origin, direction in _shadow_targets(scene, hit_pos, live, cfg):
        occ |= any_hit(scene, origin, direction, cfg, pack=pack)
    return occ


def local_color(scene: Scene, hit: Hit, rd: Array, cfg: RenderConfig,
                live: Array | None = None, pack=None,
                shadowed: Array | None = None) -> Array:
    """Direct (local) shade at a hit: Phong + ambient, with the reference's
    shadow blend ``final*1e-4 + shadowColor*(1-1e-4)``.

    ``live`` marks lanes whose result is actually used — dead lanes' shadow
    rays are parked (zero accel work), their output is masked by the caller.
    ``shadowed`` supplies a precomputed occlusion mask (the merged-query
    wavefront path batches shadow rays with the next level's closest query);
    when None the shadow query runs here. Ref: Serial/world.cpp:40-63.
    """
    if live is None:
        live = hit.valid
    lc = light_shade(hit.position, hit.normal, rd, hit.color, hit.kd, hit.ks, scene, cfg)
    amb = scene.ambient[None, :] * hit.color * hit.ka[:, None]
    lc = lc + amb
    if cfg.shadows and scene.lights.position.shape[0]:
        if shadowed is None:
            shadowed = shadow_mask(scene, lax.stop_gradient(hit.position),
                                   lax.stop_gradient(live), cfg, pack=pack)
        b = cfg.shadow_blend
        lc = jnp.where(shadowed[:, None], lc * b + amb * (1.0 - b), lc)
    return lc


def _children_geom(scene: Scene, hit: Hit, ro: Array, rd: Array, coeff: Array,
                   cfg: RenderConfig):
    """Child-ray geometry of one wavefront step (NO shading, NO queries).

    Returns (valid, is_diel, (ro_r, rd_r, coeff_r), (ro_t, rd_t, coeff_t)).
    Mirrors the branch structure of Serial/world.cpp:77-109:
      * dielectric (kr>0 && kt>0): Fresnel–Schlick split, Beer attenuation on
        exit;
      * reflective (kr>0): kr-weighted reflection child;
      * plain: no children.
    """
    dt = ro.dtype
    active = jnp.any(coeff > 0.0, axis=-1)
    valid = hit.valid & active

    i = vec.normalize(rd)
    n = vec.normalize(hit.normal)
    is_diel = valid & (hit.kr > 0.0) & (hit.kt > 0.0)
    is_refl = valid & (hit.kr > 0.0) & ~is_diel

    # ---- reflection child (shared by dielectric + reflective paths) ------
    r_dir = vec.reflect(i, n)
    ro_r = hit.position + cfg.ray_offset * r_dir
    rd_r = vec.normalize(r_dir)

    # ---- dielectric physics (Serial/world.cpp:77-100) --------------------
    eta = hit.eta
    ndi = vec.dot(rd, n)           # sign test uses the (already normalized) direction
    entering = ndi < 0.0
    t_in, ok_in = vec.refract(i, n, eta)
    c_in = -vec.dot(i, n)
    t_out, ok_out = vec.refract(i, -n, 1.0 / jnp.where(eta != 0, eta, 1.0))
    c_out = vec.dot(t_out, n)
    # Beer-style exit attenuation, k = e^{-sigma * t} (Serial/world.cpp:85)
    sig = jnp.asarray(cfg.beer_sigma, dt)
    k_exit = jnp.exp(-sig[None, :] * hit.t[:, None])
    k = jnp.where(entering[:, None], 1.0, k_exit)
    tir_exit = ~entering & ~ok_out          # exit-side total internal reflection
    c = jnp.where(entering, c_in, c_out)
    r0 = ((eta - 1.0) ** 2) / jnp.maximum((eta + 1.0) ** 2, 1e-30)
    fres = r0 + (1.0 - r0) * (1.0 - c) ** 5
    t_dir = jnp.where(entering[:, None], t_in, t_out)
    t_ok = jnp.where(entering, ok_in, ok_out)
    # reference would emit a zero-direction (NaN-normalized) ray on
    # entering-TIR; we kill that child instead (documented divergence).
    ro_t = hit.position + cfg.ray_offset * t_dir
    rd_t = vec.normalize(t_dir)

    w_reflect = jnp.where(is_diel, jnp.where(tir_exit, 1.0, fres),
                          jnp.where(is_refl, hit.kr, 0.0))
    coeff_r = coeff * w_reflect[:, None] * jnp.where(is_diel[:, None], k, 1.0)
    coeff_t = coeff * jnp.where((is_diel & t_ok & ~tir_exit)[:, None],
                                k * (1.0 - fres[:, None]), 0.0)
    # park rays whose continuation carries no energy — zero accel work for
    # dead lanes at the next level
    ro_r, rd_r = _park_dead(ro_r, rd_r, jnp.any(lax.stop_gradient(coeff_r) > 0.0, axis=-1))
    ro_t, rd_t = _park_dead(ro_t, rd_t, jnp.any(lax.stop_gradient(coeff_t) > 0.0, axis=-1))
    return valid, is_diel, (ro_r, rd_r, coeff_r), (ro_t, rd_t, coeff_t)


def _local_contrib(scene: Scene, hit: Hit, rd: Array, coeff: Array,
                   valid: Array, is_diel: Array, cfg: RenderConfig, pack=None,
                   miss_background: bool = True,
                   shadowed: Array | None = None) -> Array:
    """Local (this-level) color contribution of a wavefront step: Phong shade
    on valid non-dielectric lanes (+ background on active misses).
    ``shadowed`` is the optional precomputed occlusion mask."""
    active = jnp.any(coeff > 0.0, axis=-1)
    lc = local_color(scene, hit, rd, cfg, live=valid, pack=pack, shadowed=shadowed)
    # miss → background; dielectric → no local term (Serial/world.cpp:100 returns children only)
    contrib = jnp.where(valid[:, None] & ~is_diel[:, None], coeff * lc, 0.0)
    if miss_background:
        contrib = contrib + jnp.where((active & ~hit.valid)[:, None],
                                      coeff * scene.background[None], 0.0)
    return contrib


def _children(scene: Scene, hit: Hit, ro: Array, rd: Array, coeff: Array,
               cfg: RenderConfig, pack=None, miss_background: bool = True):
    """One wavefront step: local contribution + (reflect, refract) children.

    Returns (contrib, (ro_r, rd_r, coeff_r), (ro_t, rd_t, coeff_t)).
    The shadow query runs inline (unmerged) — the branching dielectric path
    and non-wavefront callers use this; the scan paths use the split
    ``_children_geom`` + merged query + ``_local_contrib`` instead.
    """
    valid, is_diel, child_r, child_t = _children_geom(scene, hit, ro, rd, coeff, cfg)
    contrib = _local_contrib(scene, hit, rd, coeff, valid, is_diel, cfg,
                             pack=pack, miss_background=miss_background)
    return contrib, child_r, child_t


def _shadow_occlusion(scene: Scene, hit: Hit, valid: Array, cfg: RenderConfig,
                      pack=None, exact_mask=None) -> Array | None:
    """Batched per-level shadow occlusion: ONE sweep covering every light's
    shadow segment, folded to a per-lane any-light-occluded mask. any-mode
    (division-free OR-reduce epilogue + all-occluded early exit) under the
    default ``shadow_any_mode``; a closest sweep (fam != FAM_NONE) otherwise
    — identical booleans, 'highest'-precision occlusion. None when shadows
    are off. Ref semantics: Serial/world.cpp:42-51 (any hit, even beyond the
    light, counts as shadow)."""
    nl = scene.lights.position.shape[0] if cfg.shadows else 0
    if nl == 0:
        return None
    sh = _shadow_targets(scene, lax.stop_gradient(hit.position),
                         lax.stop_gradient(valid), cfg)
    ros = jnp.concatenate([o for o, _ in sh])
    rds = jnp.concatenate([d for _, d in sh])
    if cfg.shadow_any_mode:
        occ_all = any_hit(scene, ros, rds, cfg, pack=pack,
                          exact_mask=exact_mask)
    else:
        _, fam, _ = closest_query(scene, ros, rds, cfg, pack=pack,
                                  exact_mask=exact_mask)
        occ_all = fam != FAM_NONE
    r = hit.t.shape[0]
    occ = jnp.zeros((r,), bool)
    for l in range(nl):
        occ |= occ_all[l * r:(l + 1) * r]
    return occ


def _merged_query(scene: Scene, hit: Hit, valid: Array, children, cfg: RenderConfig,
                  pack=None):
    """ONE batched closest query covering this level's shadow rays (one
    segment per light) and the next level's child rays (one segment per child
    wavefront) — a single sweep invocation instead of (lights + children),
    amortizing the per-invocation fixed costs (feature build, chunk mask +
    argsort, kernel launch).

    ``children`` is one ``(ro, rd, coeff)`` triple or a list of them.
    Occlusion semantics match ``any_hit``: anything with t > SMALLEST_DIST
    occludes (fam != FAM_NONE). Returns (shadowed | None, [(t, fam, idx) per
    child segment]).
    """
    if not isinstance(children[0], (list, tuple)):   # single (ro, rd, coeff)
        children = [children]

    # secondary wavefronts get the exact per-ray chunk mask at ANY width
    # (blockwise, memory-bounded): interval lists are 2-2.5x looser for
    # shadow/child rays on close framings (benchmarks/exp_mask_stats.py)
    em = True if cfg.exact_mask_secondary else None

    ro_cs = [c[0] for c in children]
    rd_cs = [c[1] for c in children]
    nl = scene.lights.position.shape[0] if cfg.shadows else 0
    if nl == 0:
        t, fam, idx = closest_query(scene, jnp.concatenate(ro_cs),
                                    jnp.concatenate(rd_cs), cfg, pack=pack,
                                    exact_mask=em)
        occ = None
    elif cfg.shadow_any_mode:
        # shadows as ONE batched first-hit (any-mode) query: the occlusion
        # sweep runs the division-free OR-reduce epilogue and can exit as
        # soon as every live lane is occluded — shadow rays are the dominant
        # share of secondary sweep work (they cross the whole model toward
        # the light), so they get the cheap epilogue while the (closest)
        # child query keeps min/argmin.
        occ = _shadow_occlusion(scene, hit, valid, cfg, pack=pack,
                                exact_mask=em)
        t, fam, idx = closest_query(scene, jnp.concatenate(ro_cs),
                                    jnp.concatenate(rd_cs), cfg, pack=pack,
                                    exact_mask=em)
    else:
        sh = _shadow_targets(scene, lax.stop_gradient(hit.position),
                             lax.stop_gradient(valid), cfg)
        ros = jnp.concatenate([o for o, _ in sh] + ro_cs)
        rds = jnp.concatenate([d for _, d in sh] + rd_cs)
        t, fam, idx = closest_query(scene, ros, rds, cfg, pack=pack,
                                    exact_mask=em)
        r = hit.t.shape[0]
        occ = jnp.zeros((r,), bool)
        for l in range(nl):
            occ |= fam[l * r:(l + 1) * r] != FAM_NONE
        s = nl * r
        t, fam, idx = t[s:], fam[s:], idx[s:]
    out = []
    s = 0
    for ro_c in ro_cs:
        e = s + ro_c.shape[0]
        out.append((t[s:e], fam[s:e], idx[s:e]))
        s = e
    return occ, out



def _level_ckpt(cfg: RenderConfig):
    """Per-bounce-level rematerialization wrapper for scan bodies.

    The naive backward of a 1080p frame saves every shading intermediate of
    every level (measured 89GB of residuals — 5x HBM); wrapping each level in
    jax.checkpoint with the save_only_these_names("sweep") policy keeps ONLY
    the accel query results (tagged in ops/intersect) and the scan carries,
    recomputing the cheap differentiable shading in the backward. The Pallas
    sweep itself is never re-run — its outputs ARE the named residuals.
    (A single whole-frame checkpoint region is strictly worse: XLA's
    recompute-in-backward ballooned to 330GB of loop temps.)
    """
    if not cfg.remat:
        return lambda f: f
    policy = jax.checkpoint_policies.save_only_these_names("sweep")
    return lambda f: jax.checkpoint(f, policy=policy)


def _compact_children(child_r, child_t, pix: Array):
    """Fold a level's (reflect ‖ refract) children — 2K candidate lanes —
    back into K lanes by liveness compaction.

    The stable boolean sort keeps live lanes in (reflect-block, refract-block)
    order, so spatial coherence within each block survives for the accel's
    chunk masks. Capacity: K lanes for up to 2K live children; in Whitted
    scenes most lanes are non-dielectric (one child) or dead, so K = 2 x the
    level-0 width is ample — if it ever overflows, the tail (latest refract
    children, geometrically-decayed coefficients) is dropped.

    ``pix`` maps each lane to its output pixel slot (children inherit the
    parent's). Returns (ro, rd, coeff, pix, dropped) at width K; ``dropped``
    is the total contribution-coefficient mass of live children beyond the
    capacity (0.0 when nothing overflowed) — the image error of the drop is
    bounded by that mass (colors are clamped to [0,1] per channel), and the
    stat is threaded up so callers/tests can assert the bound
    (tests/test_branching.py pins both the no-overflow and overflow cases).
    """
    k = pix.shape[0]
    ro2 = jnp.concatenate([child_r[0], child_t[0]])
    rd2 = jnp.concatenate([child_r[1], child_t[1]])
    coeff2 = jnp.concatenate([child_r[2], child_t[2]])
    pix2 = jnp.concatenate([pix, pix])
    mass = jnp.sum(lax.stop_gradient(coeff2), axis=-1).astype(jnp.float32)
    live = mass > 0.0
    order_full = jnp.argsort(~live, stable=True).astype(jnp.int32)
    order = order_full[:k]
    tail = order_full[k:]                       # live lanes here overflowed
    dropped = jnp.sum(jnp.where(live[tail], mass[tail], 0.0))
    return ro2[order], rd2[order], coeff2[order], pix2[order], dropped


def _compact_children_tiles(child_r, child_t, tile_pix: Array, nt: int):
    """Fold a level's (reflect ‖ refract) children — 2·K_t candidate TILES —
    back to K_t tiles by TILE-liveness compaction.

    Children inherit their parent's lane, so tile structure survives
    branching; compacting whole 1024-lane tiles replaces the lane variant's
    full-width argsort + per-lane row gathers + per-lane contribution
    scatters (profiled ~375 ms/frame at 1080p — fusion.2884 et al.,
    docs/KERNEL.md round-4) with a ~4k-element sort and tile-granular
    gathers. ``tile_pix`` maps each tile to its OUTPUT pixel tile in
    nt-space (``nt`` = drop sentinel); duplicates are expected (a parent's
    reflect and refract tiles both map to the parent's pixel tile).
    Capacity/overflow semantics as the lane version, at tile granularity:
    the total coefficient mass of live tiles beyond capacity is returned
    (bounds the image error; tests/test_branching.py pins both regimes
    through the flat path, tests/test_compaction.py the equality here)."""
    tile = WAVEFRONT_TILE
    kt = tile_pix.shape[0]
    ro2 = jnp.concatenate([child_r[0], child_t[0]])      # (2*kt*tile, 3)
    rd2 = jnp.concatenate([child_r[1], child_t[1]])
    coeff2 = jnp.concatenate([child_r[2], child_t[2]])
    tp2 = jnp.concatenate([tile_pix, tile_pix])          # (2*kt,)
    mass_lane = jnp.sum(lax.stop_gradient(coeff2), axis=-1).astype(jnp.float32)
    mass_tile = jnp.sum(mass_lane.reshape(2 * kt, tile), axis=1)
    live = mass_tile > 0.0
    order = jnp.argsort(~live, stable=True).astype(jnp.int32)
    sel = order[:kt]
    tail = order[kt:]
    dropped = jnp.sum(jnp.where(live[tail], mass_tile[tail], 0.0))

    def g3(x):
        return x.reshape(2 * kt, tile, 3)[sel].reshape(kt * tile, 3)

    tp_new = jnp.where(live[sel], tp2[sel], nt)          # dead tiles -> drop
    return g3(ro2), g3(rd2), g3(coeff2), tp_new, dropped


def _branch_entry_tiles(scene: Scene, ro0: Array, rd0: Array, coeff0: Array,
                        tidx: Array, nt: int, accum: Array, cfg: RenderConfig,
                        pack, count_rays, q0):
    """Level 0 of the TILE-granular dielectric wavefront.

    ``tidx`` maps the cap parent tiles to pixel tiles (pads = nt, dropped);
    ``accum`` is the (nt, tile, 3) tile-shaped accumulator. Shades level 0
    (shadow occlusion at PARENT width, contribution scattered
    tile-granularly, sorted indices) and spawns the (reflect ‖ refract)
    children as 2·cap candidate tiles — WITHOUT querying them: the child
    closest query is deferred to ``_branch_rung_ladder`` so it runs at the
    compacted rung width, not at 2·cap (most candidate tiles are dead —
    non-dielectric parents spawn one child, misses none; querying before
    compaction paid the full 2x sweep every frame). Level-0 ray counting is
    the caller's (full-width) job."""
    t0, fam0, idx0 = q0
    hit0 = hit_attributes(scene, ro0, rd0, t0, fam0, idx0, cfg, pack=pack)
    valid0, isd0, child_r, child_t = _children_geom(scene, hit0, ro0, rd0,
                                                    coeff0, cfg)
    ro_k = jnp.concatenate([child_r[0], child_t[0]])
    rd_k = jnp.concatenate([child_r[1], child_t[1]])
    coeff_k = jnp.concatenate([child_r[2], child_t[2]])
    tp_k = jnp.concatenate([tidx, tidx])
    em = True if cfg.exact_mask_secondary else None
    occ0 = _shadow_occlusion(scene, hit0, valid0, cfg, pack=pack,
                             exact_mask=em)
    contrib0 = _local_contrib(scene, hit0, rd0, coeff0, valid0, isd0, cfg,
                              pack=pack, miss_background=False, shadowed=occ0)
    cap = tidx.shape[0]
    accum = accum.at[tidx].add(contrib0.reshape(cap, WAVEFRONT_TILE, 3),
                               mode="drop", indices_are_sorted=True)
    return (ro_k, rd_k, coeff_k, tp_k, accum,
            jnp.zeros((), jnp.float32), jnp.zeros((), jnp.float32))


def _branch_rung_ladder(scene: Scene, cfg: RenderConfig, pack, carry,
                        count_rays, nt: int):
    """Capacity ladder for the tile-granular dielectric wavefront: the entry
    always emits 2·cap candidate child tiles (reflect ‖ refract blocks), but
    on ordinary scenes only a fraction are live (dielectric pixels are a
    minority). Select the smallest rung 2·cap / 2^k that fits the live-tile
    count ONCE (lax.switch, like the level-0 and deep-level ladders), gather
    live tiles first, and only THEN issue the level-1 child closest query —
    at rung width instead of 2·cap (the round-4 layout queried all 2·cap
    candidates before compacting; on bob+glass ~70% of that sweep was dead
    tiles). Every bounce level then runs at the rung width. Overflowing live
    tiles' mass is added to the dropped-mass stat (same reported-drop
    semantics as ``_compact_children_tiles``)."""
    ro_k, rd_k, coeff_k, tp_k, accum, nrays, dropped = carry
    tile = WAVEFRONT_TILE
    k0 = tp_k.shape[0]                           # 2*cap child tiles
    mass = jnp.sum(lax.stop_gradient(coeff_k), axis=-1).astype(jnp.float32)
    mass_t = jnp.sum(mass.reshape(k0, tile), axis=1)
    live = mass_t > 0.0
    cnt = jnp.sum(live, dtype=jnp.int32)
    rungs = sorted({-(-k0 // 2 ** k) for k in range(max(cfg.branch_buckets, 1))})
    em = True if cfg.exact_mask_secondary else None

    def rung(kcap: int):
        gather = kcap < k0

        def f(op):
            ro_k, rd_k, coeff_k, tp_k, accum, nrays, dropped = op
            if gather:
                order = jnp.argsort(~live, stable=True).astype(jnp.int32)
                sel = order[:kcap]
                tail = order[kcap:]
                dropped = dropped + jnp.sum(
                    jnp.where(live[tail], mass_t[tail], 0.0))

                def g3(x):
                    return x.reshape(k0, tile, 3)[sel].reshape(kcap * tile, 3)

                ro_g, rd_g, coeff_g = g3(ro_k), g3(rd_k), g3(coeff_k)
                tp_g = jnp.where(live[sel], tp_k[sel], nt)
            else:
                ro_g, rd_g, coeff_g, tp_g = ro_k, rd_k, coeff_k, tp_k
            if cfg.max_depth == 0:   # children never consumed: park the query
                ro_q, rd_q = _park_dead(ro_g, rd_g,
                                        jnp.zeros((ro_g.shape[0],), bool))
            else:
                ro_q, rd_q = ro_g, rd_g
            qk = closest_query(scene, ro_q, rd_q, cfg, pack=pack,
                               exact_mask=em)
            carry2 = (ro_g, rd_g, coeff_g, tp_g, *qk, accum, nrays, dropped)
            return _branch_levels_tiles(scene, cfg, pack, carry2, count_rays, nt)
        return f

    branches = [_level_ckpt(cfg)(rung(k)) for k in rungs]
    b = jnp.sum(cnt > jnp.asarray(rungs, jnp.int32))
    return lax.switch(b, branches, carry)


def _branch_levels_tiles(scene: Scene, cfg: RenderConfig, pack, carry,
                         count_rays, nt: int):
    """Dielectric bounce levels 1..max_depth, TILE-granular: the lane-based
    ``_branch_levels`` with tile compaction + tile-granular contribution
    scatters (unsorted + duplicate tile ids — a parent's two child tiles
    share an output tile — but only ~4k index rows). After level 1 a DEEP
    re-ladder re-selects the rung from the then-live tile count (only
    re-hit children survive past level 1 — typically a small fraction of
    the entry rung) and runs levels 2..max_depth at that width, the same
    move as the non-branching deep-level compaction."""
    tile = WAVEFRONT_TILE

    def step(carry, is_last):
        ro_s, rd_s, coeff_s, tp, t, fam, idx, accum, nrays, dropped = carry
        kt = tp.shape[0]
        hit = hit_attributes(scene, ro_s, rd_s, t, fam, idx, cfg, pack=pack)
        nrays = nrays + count_rays(coeff_s, hit)
        valid, is_diel, child_r, child_t = _children_geom(scene, hit, ro_s,
                                                          rd_s, coeff_s, cfg)
        ro_n, rd_n, coeff_n, tp_n, drop_l = _compact_children_tiles(
            child_r, child_t, tp, nt)
        dropped = dropped + drop_l
        ro_q, rd_q = _park_dead(ro_n, rd_n,
                                jnp.broadcast_to(~is_last, (ro_n.shape[0],)))
        occ, [qn] = _merged_query(scene, hit, valid, (ro_q, rd_q, coeff_n),
                                  cfg, pack=pack)
        contrib = _local_contrib(scene, hit, rd_s, coeff_s, valid, is_diel,
                                 cfg, pack=pack, shadowed=occ)
        accum = accum.at[tp].add(contrib.reshape(kt, tile, 3), mode="drop")
        return (ro_n, rd_n, coeff_n, tp_n, *qn, accum, nrays, dropped), None

    def finish(carry):
        _, _, coeff_f, tp_f, _, _, _, accum, nrays, dropped = carry
        # depth-exceeded live children → background
        kt = tp_f.shape[0]
        accum = accum.at[tp_f].add(
            (coeff_f * scene.background[None]).reshape(kt, tile, 3),
            mode="drop")
        return accum, nrays, dropped

    if cfg.max_depth == 0:
        return finish(carry)
    # level 1 at the entry rung width
    carry, _ = _level_ckpt(cfg)(step)(carry, jnp.asarray(cfg.max_depth == 1))
    if cfg.max_depth == 1:
        return finish(carry)
    if cfg.branch_buckets <= 1:
        xs = jnp.arange(1, cfg.max_depth) == cfg.max_depth - 1
        carry, _ = lax.scan(_level_ckpt(cfg)(step), carry, xs)
        return finish(carry)

    # ---- deep re-ladder: levels 2..max_depth at the live-tile rung -------
    ro_k, rd_k, coeff_k, tp_k, t, fam, idx, accum, nrays, dropped = carry
    kt = tp_k.shape[0]
    mass = jnp.sum(lax.stop_gradient(coeff_k), axis=-1).astype(jnp.float32)
    mass_t = jnp.sum(mass.reshape(kt, tile), axis=1)
    live = mass_t > 0.0
    cnt = jnp.sum(live, dtype=jnp.int32)
    rungs = sorted({-(-kt // 2 ** k) for k in range(cfg.branch_buckets + 1)})
    xs_deep = jnp.arange(1, cfg.max_depth) == cfg.max_depth - 1

    def rung(kcap: int):
        gather = kcap < kt

        def f(op):
            ro_k, rd_k, coeff_k, tp_k, t, fam, idx, accum, nrays, dropped = op
            if gather:
                order = jnp.argsort(~live, stable=True).astype(jnp.int32)
                sel = order[:kcap]
                tail = order[kcap:]
                dropped = dropped + jnp.sum(
                    jnp.where(live[tail], mass_t[tail], 0.0))

                def g3(x):
                    return x.reshape(kt, tile, 3)[sel].reshape(kcap * tile, 3)

                def g1(x):
                    return x.reshape(kt, tile)[sel].reshape(kcap * tile)

                ro_k, rd_k, coeff_k = g3(ro_k), g3(rd_k), g3(coeff_k)
                t, fam, idx = g1(t), g1(fam), g1(idx)
                # dead-pad tiles: zero coefficients (mask every contribution
                # and the ray count) + drop-sentinel scatter slots
                padlive = jnp.repeat(live[sel], tile)
                coeff_k = jnp.where(padlive[:, None], coeff_k, 0.0)
                tp_k = jnp.where(live[sel], tp_k[sel], nt)
            carry2 = (ro_k, rd_k, coeff_k, tp_k, t, fam, idx,
                      accum, nrays, dropped)
            carry2, _ = lax.scan(_level_ckpt(cfg)(step), carry2, xs_deep)
            return finish(carry2)
        return f

    branches = [_level_ckpt(cfg)(rung(k)) for k in rungs]
    b = jnp.sum(cnt > jnp.asarray(rungs, jnp.int32))
    return lax.switch(b, branches, (ro_k, rd_k, coeff_k, tp_k, t, fam, idx,
                                    accum, nrays, dropped))


def _branch_entry(scene: Scene, ro0: Array, rd0: Array, coeff0: Array,
                  pix0: Array, accum: Array, cfg: RenderConfig, pack,
                  count_rays, q0=None, miss_background: bool = True,
                  count_level0: bool = True, feat0=None):
    """Level 0 of the flat dielectric wavefront at width W.

    Shades level 0, spawns its (reflect ‖ refract) children as a K = 2W lane
    wavefront (no compaction needed — 2W children of W lanes), and issues the
    merged query (shadow segments + the FULL child wavefront in ONE sweep).
    Returns (carry, accum, nrays) where carry is the `_branch_levels` scan
    state. ``q0`` optionally reuses an already-computed level-0 query.
    """
    if q0 is None:
        q0 = closest_query(scene, ro0, rd0, cfg, pack=pack, feat=feat0)
    t0, fam0, idx0 = q0
    hit0 = hit_attributes(scene, ro0, rd0, t0, fam0, idx0, cfg, pack=pack)
    nrays = count_rays(coeff0, hit0) if count_level0 else jnp.zeros((), jnp.float32)
    valid0, isd0, child_r, child_t = _children_geom(scene, hit0, ro0, rd0,
                                                    coeff0, cfg)
    ro_k = jnp.concatenate([child_r[0], child_t[0]])
    rd_k = jnp.concatenate([child_r[1], child_t[1]])
    coeff_k = jnp.concatenate([child_r[2], child_t[2]])
    pix_k = jnp.concatenate([pix0, pix0])
    if cfg.max_depth == 0:   # children are never consumed: park their query
        ro_q, rd_q = _park_dead(ro_k, rd_k, jnp.zeros((ro_k.shape[0],), bool))
    else:
        ro_q, rd_q = ro_k, rd_k
    occ0, [qk] = _merged_query(scene, hit0, valid0, (ro_q, rd_q, coeff_k),
                               cfg, pack=pack)
    contrib0 = _local_contrib(scene, hit0, rd0, coeff0, valid0, isd0, cfg,
                              pack=pack, miss_background=miss_background,
                              shadowed=occ0)
    accum = accum.at[pix0].add(contrib0, mode="drop")
    carry = (ro_k, rd_k, coeff_k, pix_k, *qk, accum, nrays,
             jnp.zeros((), jnp.float32))     # dropped-overflow coeff mass
    return carry


def _branch_levels(scene: Scene, cfg: RenderConfig, pack, carry, count_rays):
    """Dielectric bounce levels 1..max_depth as a constant-width lax.scan.

    Each step: differentiable attributes from the carried query → (reflect ‖
    refract) children → liveness compaction back to K lanes → ONE merged
    query (this level's shadow rays + the compacted next wavefront) →
    contribution scatter through the per-lane pixel-slot map. This replaces
    the former unrolled binary ray tree (2^depth full-width queries, no
    compaction, inline shadow queries) with the same machinery the
    non-branching path uses, at exactly 2x a non-branching level's width.
    Ref semantics: Serial/world.cpp:77-109 (dielectric/reflective branches).

    Returns (accum, nrays) with depth-exceeded children folded to background.
    """
    def step(carry, is_last):
        ro_s, rd_s, coeff_s, pix, t, fam, idx, accum, nrays, dropped = carry
        hit = hit_attributes(scene, ro_s, rd_s, t, fam, idx, cfg, pack=pack)
        nrays = nrays + count_rays(coeff_s, hit)
        valid, is_diel, child_r, child_t = _children_geom(scene, hit, ro_s,
                                                          rd_s, coeff_s, cfg)
        ro_n, rd_n, coeff_n, pix_n, drop_l = _compact_children(child_r,
                                                               child_t, pix)
        dropped = dropped + drop_l
        ro_q, rd_q = _park_dead(ro_n, rd_n,
                                jnp.broadcast_to(~is_last, pix.shape))
        occ, [qn] = _merged_query(scene, hit, valid, (ro_q, rd_q, coeff_n),
                                  cfg, pack=pack)
        contrib = _local_contrib(scene, hit, rd_s, coeff_s, valid, is_diel,
                                 cfg, pack=pack, shadowed=occ)
        accum = accum.at[pix].add(contrib, mode="drop")
        return (ro_n, rd_n, coeff_n, pix_n, *qn, accum, nrays, dropped), None

    if cfg.max_depth > 0:
        xs = jnp.arange(cfg.max_depth) == cfg.max_depth - 1
        carry, _ = lax.scan(_level_ckpt(cfg)(step), carry, xs)
    _, _, coeff_f, pix_f, _, _, _, accum, nrays, dropped = carry
    # depth-exceeded live children → background (Serial/world.cpp:37-39 analog)
    accum = accum.at[pix_f].add(coeff_f * scene.background[None], mode="drop")
    return accum, nrays, dropped


def trace_wavefront(scene: Scene, ro: Array, rd: Array, cfg: RenderConfig,
                    branching: bool | None = None, coeff: Array | None = None,
                    with_stats: bool = False, feat0: Array | None = None,
                    debug_stats: dict | None = None):
    """Trace a wavefront of rays to completion; returns accumulated color
    (R,3) and, optionally, the traced-ray count (for Mrays/s accounting).

    ``debug_stats``: pass a dict to receive diagnostics; the branching path
    fills "dropped_children_coeff" — the total coefficient mass of live
    (reflect ‖ refract) children dropped by `_compact_children` capacity
    overflow (0.0 in ordinary Whitted scenes; bounds the image error).

    ``branching=None`` auto-selects: dielectric scenes get the flat 2W-wide
    compacted (reflect ‖ refract) wavefront (``_branch_levels``); otherwise a
    constant-lane ``lax.scan`` over ``cfg.max_depth+1`` levels.
    """
    if branching is None:
        branching = scene.has_dielectrics()
    nl = scene.lights.position.shape[0] if (cfg.shadows and scene.lights.position.shape[0]) else 0
    if coeff is None:
        coeff = jnp.ones_like(ro)

    # scene-constant sweep inputs, built ONCE for all levels and queries
    pack = None
    if cfg.accel == "pallas" and scene.n_triangles:
        from realtrace_tpu.ops.pallas import trace as _ptrace
        pack = _ptrace.build_pack(scene, cfg)

    def count_rays(coeff_arr, hit):
        """Rays actually traced this level: one closest-hit query per active
        lane, plus one shadow ray per light per VALID hit (shadow rays for
        missed/parked lanes are parked — never traced). Ref: the serial
        shader casts shadow rays only inside the hit branch
        (Serial/world.cpp:40-51)."""
        active = jnp.any(coeff_arr > 0.0, axis=-1)
        prim = jnp.sum(active.astype(jnp.float32))
        return prim + nl * jnp.sum((active & hit.valid).astype(jnp.float32))

    if not branching:
        r = ro.shape[0]
        tile = WAVEFRONT_TILE
        nt = r // tile if r % tile == 0 else 0
        compact = cfg.compact_levels and nt >= 4

        if not compact:
            if not cfg.merge_queries:
                def step(carry, _):
                    ro, rd, coeff, accum, nrays = carry
                    hit = closest_hit(scene, ro, rd, cfg, pack=pack)
                    nrays = nrays + count_rays(coeff, hit)
                    contrib, (ro_r, rd_r, coeff_r), _ = _children(scene, hit, ro, rd, coeff,
                                                                  cfg, pack=pack)
                    return (ro_r, rd_r, coeff_r, accum + contrib, nrays), None

                init = (ro, rd, coeff, jnp.zeros_like(ro), jnp.zeros((), jnp.float32))
                (ro_f, rd_f, coeff_f, accum, nrays), _ = lax.scan(
                    _level_ckpt(cfg)(step), init, None, length=cfg.max_depth + 1)
                accum = accum + coeff_f * scene.background[None]   # depth-exceeded → background
                return (accum, nrays) if with_stats else accum

            # merged-query scan: each iteration shades the CURRENT level from
            # the carried query result and issues ONE batched query (shadow
            # segments + next level's reflection rays)
            q0 = closest_query(scene, ro, rd, cfg, pack=pack, feat=feat0)

            def step(carry, is_last):
                ro_s, rd_s, coeff_s, t, fam, idx, accum, nrays = carry
                hit = hit_attributes(scene, ro_s, rd_s, t, fam, idx, cfg, pack=pack)
                nrays = nrays + count_rays(coeff_s, hit)
                valid, is_diel, child_r, _ = _children_geom(scene, hit, ro_s, rd_s,
                                                            coeff_s, cfg)
                ro_r, rd_r, coeff_r = child_r
                # final level: its child query result is never consumed — park
                # the child segment so the sweep masks its work to zero
                ro_q, rd_q = _park_dead(ro_r, rd_r,
                                        jnp.broadcast_to(~is_last, valid.shape))
                occ, [(tn, famn, idxn)] = _merged_query(scene, hit, valid,
                                                        (ro_q, rd_q, coeff_r),
                                                        cfg, pack=pack)
                contrib = _local_contrib(scene, hit, rd_s, coeff_s, valid, is_diel,
                                         cfg, pack=pack, shadowed=occ)
                return (ro_r, rd_r, coeff_r, tn, famn, idxn,
                        accum + contrib, nrays), None

            t0, fam0, idx0 = q0
            init = (ro, rd, coeff, t0, fam0, idx0,
                    jnp.zeros_like(ro), jnp.zeros((), jnp.float32))
            xs = jnp.arange(cfg.max_depth + 1) == cfg.max_depth
            (ro_f, rd_f, coeff_f, *_q, accum, nrays), _ = lax.scan(
                _level_ckpt(cfg)(step), init, xs)
            accum = accum + coeff_f * scene.background[None]   # depth-exceeded → background
            return (accum, nrays) if with_stats else accum

        # ---- hit-tile-compacted wavefront. The ONLY full-width accel pass is
        # the level-0 forward query; every ray that can contribute after it
        # lives in a tile with at least one level-0 hit (children spawn in
        # their parent's lane, and reflection-only continuation never moves a
        # lane across tiles). So: gather the hit tiles ONCE into the smallest
        # static capacity that fits (lax.switch), run ALL differentiable
        # shading and every deeper bounce at that width, and scatter ONLY the
        # per-level color contributions back (one tile-granular scatter-add
        # per level) — never the rays. Replaces the previous per-level
        # gather/scatter of the full carry, which cost ~11ms/level at 1080p.
        dt = ro.dtype
        t0, fam0, idx0 = closest_query(scene, ro, rd, cfg, pack=pack, feat=feat0)
        active0 = jnp.any(coeff > 0.0, axis=-1)
        valid0 = (fam0 != FAM_NONE) & active0
        nrays0 = (jnp.sum(active0.astype(jnp.float32))
                  + nl * jnp.sum(valid0.astype(jnp.float32)))
        # background for every active level-0 miss, at full width (elementwise)
        accum0 = jnp.where((active0 & (fam0 == FAM_NONE))[:, None],
                           coeff * scene.background[None], 0.0)
        hit_tl = jnp.any(valid0.reshape(nt, tile), axis=1)
        cnt = jnp.sum(hit_tl, dtype=jnp.int32)

        # tile capacities nt, nt/4, ..., nt/4^(buckets-1): one compiled branch
        # per bucket, selected by the live-tile count at run time
        caps = sorted({-(-nt // 4 ** k) for k in range(max(cfg.compact_buckets, 1))})
        caps_arr = jnp.asarray(caps, jnp.int32)

        def branch(cap: int):
            def br(operand):
                t0, fam0, idx0, coeff_f = operand
                # hit-tile ids, ascending; pads get the out-of-range sentinel
                # nt so contribution scatters drop them (indices stay sorted
                # and duplicate-free — no atomic-style collisions to resolve)
                tidx = jnp.nonzero(hit_tl, size=cap, fill_value=nt)[0].astype(jnp.int32)
                tsafe = jnp.minimum(tidx, nt - 1)

                def g3(x):
                    return x.reshape(nt, tile, 3)[tsafe].reshape(cap * tile, 3)

                def g1(x):
                    return x.reshape(nt, tile)[tsafe].reshape(cap * tile)

                def put(acc, xc):
                    return acc.at[tidx].add(xc.reshape(cap, tile, 3),
                                            mode="drop", indices_are_sorted=True)

                ro_c, rd_c, coeff_c = g3(ro), g3(rd), g3(coeff_f)
                t_c, fam_c, idx_c = g1(t0), g1(fam0), g1(idx0)
                padlive = jnp.repeat(tidx < nt, tile)
                coeff_c = jnp.where(padlive[:, None], coeff_c, 0.0)
                fam_c = jnp.where(padlive, fam_c, FAM_NONE)

                # level-0 shading at compact width (reuses the full-width
                # query's selection — no second accel pass)
                hit0 = hit_attributes(scene, ro_c, rd_c, t_c, fam_c,
                                      idx_c.astype(jnp.int32), cfg, pack=pack)

                merged = cfg.merge_queries

                if merged:
                    valid0, isd0, child0, _ = _children_geom(
                        scene, hit0, ro_c, rd_c, coeff_c, cfg)
                    ro_r, rd_r, coeff_r = child0
                    if cfg.max_depth == 0:   # child query never consumed
                        dead = jnp.zeros_like(valid0)
                        ro_q, rd_q = _park_dead(ro_r, rd_r, dead)
                    else:
                        ro_q, rd_q = ro_r, rd_r
                    occ0, [q1] = _merged_query(scene, hit0, valid0,
                                               (ro_q, rd_q, coeff_r), cfg, pack=pack)
                    contrib0 = _local_contrib(scene, hit0, rd_c, coeff_c, valid0,
                                              isd0, cfg, pack=pack,
                                              miss_background=False, shadowed=occ0)
                else:
                    contrib0, (ro_r, rd_r, coeff_r), _ = _children(
                        scene, hit0, ro_c, rd_c, coeff_c, cfg, pack=pack,
                        miss_background=False)
                accum = put(accum0.reshape(nt, tile, 3), contrib0)

                def step_merged(carry, is_last):
                    ro_s, rd_s, coeff_s, t, fam, idx, accum, nrays = carry
                    hit = hit_attributes(scene, ro_s, rd_s, t, fam, idx, cfg,
                                         pack=pack)
                    nrays = nrays + count_rays(coeff_s, hit)
                    valid, is_diel, child_n, _ = _children_geom(
                        scene, hit, ro_s, rd_s, coeff_s, cfg)
                    ro_n, rd_n, coeff_n = child_n
                    ro_q, rd_q = _park_dead(ro_n, rd_n,
                                            jnp.broadcast_to(~is_last, valid.shape))
                    occ, [(tn, famn, idxn)] = _merged_query(
                        scene, hit, valid, (ro_q, rd_q, coeff_n), cfg, pack=pack)
                    contrib = _local_contrib(scene, hit, rd_s, coeff_s, valid,
                                             is_diel, cfg, pack=pack, shadowed=occ)
                    return (ro_n, rd_n, coeff_n, tn, famn, idxn,
                            put(accum, contrib), nrays), None

                def step(carry, _):
                    # merge_queries=False fallback: per-level closest hit with
                    # the shadow query inline (pinned by the merge_queries
                    # parametrization in tests/test_golden.py)
                    ro_s, rd_s, coeff_s, accum, nrays = carry
                    hit = closest_hit(scene, ro_s, rd_s, cfg, pack=pack)
                    nrays = nrays + count_rays(coeff_s, hit)
                    contrib, (ro_n, rd_n, coeff_n), _ = _children(
                        scene, hit, ro_s, rd_s, coeff_s, cfg, pack=pack)
                    return (ro_n, rd_n, coeff_n, put(accum, contrib), nrays), None

                def deep_phase(carry):
                    # ---- deep-level re-compaction, TILE-granular: levels
                    # >= 2 run at a second, smaller tile capacity. Level 1 is
                    # as wide as level 0's hits (every reflective hit spawns
                    # a child), but only RE-hits survive to level 2 —
                    # typically a small fraction — and children inherit their
                    # parent's lane, so tile structure persists. Gather live
                    # TILES (the level-0 compaction machinery, applied
                    # recursively): the per-level XLA shading work shrinks
                    # with the live set while gathers/scatters stay
                    # tile-granular and sorted. (The former LANE-granular
                    # variant measured ~130ms/frame of row-granular gathers +
                    # per-lane scatter-adds at a 522k-lane rung — replaced.)
                    ro_s, rd_s, coeff_s, t_s, fam_s, idx_s, accum, nrays_c = carry
                    live2 = jnp.any(lax.stop_gradient(coeff_s) > 0.0, axis=-1)
                    live_tl2 = jnp.any(live2.reshape(cap, tile), axis=1)
                    cnt2 = jnp.sum(live_tl2, dtype=jnp.int32)
                    caps2 = sorted({-(-cap // 4 ** k)
                                    for k in range(max(cfg.deep_buckets, 1))})

                    def deep_branch(cap2: int):
                        def db(op):
                            ro_s, rd_s, coeff_s, t_s, fam_s, idx_s, accum, nrays_c = op
                            # live-tile ids in phase-A (cap) tile space; pads
                            # get sentinel cap. Ascending + duplicate-free,
                            # and tidx is ascending over its live prefix, so
                            # the composed GLOBAL ids tg stay sorted.
                            t2 = jnp.nonzero(live_tl2, size=cap2,
                                             fill_value=cap)[0].astype(jnp.int32)
                            t2safe = jnp.minimum(t2, cap - 1)
                            tg = jnp.where(t2 < cap, tidx[t2safe], nt)

                            def h3(x):
                                return x.reshape(cap, tile, 3)[t2safe].reshape(cap2 * tile, 3)

                            def h1(x):
                                return x.reshape(cap, tile)[t2safe].reshape(cap2 * tile)

                            def put2(acc, xc):
                                return acc.at[tg].add(xc.reshape(cap2, tile, 3),
                                                      mode="drop",
                                                      indices_are_sorted=True)

                            padlive2 = jnp.repeat(t2 < cap, tile)
                            ro2, rd2, coeff2 = h3(ro_s), h3(rd_s), h3(coeff_s)
                            coeff2 = jnp.where(padlive2[:, None], coeff2, 0.0)
                            tq2, fam2, idx2 = h1(t_s), h1(fam_s), h1(idx_s)
                            fam2 = jnp.where(padlive2, fam2, FAM_NONE)

                            def step_deep(carry, is_last):
                                ro_s, rd_s, coeff_s, t, fam, idx, accum, nrays = carry
                                hit = hit_attributes(scene, ro_s, rd_s, t, fam,
                                                     idx, cfg, pack=pack)
                                nrays = nrays + count_rays(coeff_s, hit)
                                valid, is_diel, child_n, _ = _children_geom(
                                    scene, hit, ro_s, rd_s, coeff_s, cfg)
                                ro_n, rd_n, coeff_n = child_n
                                ro_q, rd_q = _park_dead(
                                    ro_n, rd_n,
                                    jnp.broadcast_to(~is_last, valid.shape))
                                occ, [(tn, famn, idxn)] = _merged_query(
                                    scene, hit, valid, (ro_q, rd_q, coeff_n),
                                    cfg, pack=pack)
                                contrib = _local_contrib(scene, hit, rd_s,
                                                         coeff_s, valid, is_diel,
                                                         cfg, pack=pack,
                                                         shadowed=occ)
                                return (ro_n, rd_n, coeff_n, tn, famn, idxn,
                                        put2(accum, contrib), nrays), None

                            carry2 = (ro2, rd2, coeff2, tq2, fam2, idx2,
                                      accum, nrays_c)
                            xs2 = jnp.arange(cfg.max_depth - 1) == cfg.max_depth - 2
                            carry2, _ = lax.scan(_level_ckpt(cfg)(step_deep),
                                                 carry2, xs2)
                            coeff_d2, accum2, nrays2 = carry2[2], carry2[6], carry2[7]
                            accum2 = put2(accum2, coeff_d2 * scene.background[None])
                            return accum2.reshape(r, 3), nrays2
                        return db

                    def full_branch(op):
                        # top rung (cap2 == cap): nothing shrinks — keep
                        # scanning at cap width with the phase-A tile puts
                        ro_s, rd_s, coeff_s, t_s, fam_s, idx_s, accum, nrays_c = op
                        carry = (ro_s, rd_s, coeff_s, t_s, fam_s, idx_s,
                                 accum, nrays_c)
                        xs2 = jnp.arange(cfg.max_depth - 1) == cfg.max_depth - 2
                        carry, _ = lax.scan(_level_ckpt(cfg)(step_merged), carry, xs2)
                        coeff_d, accum2, nrays2 = carry[2], carry[6], carry[7]
                        accum2 = put(accum2, coeff_d * scene.background[None])
                        return accum2.reshape(r, 3), nrays2

                    branches = [deep_branch(c2) for c2 in caps2[:-1]] + [full_branch]
                    b2 = jnp.sum(cnt2 > jnp.asarray(caps2, jnp.int32))
                    return lax.switch(b2, branches,
                                      (ro_s, rd_s, coeff_s, t_s, fam_s, idx_s,
                                       accum, nrays_c))

                if merged:
                    carry = (ro_r, rd_r, coeff_r, *q1, accum,
                             jnp.zeros((), jnp.float32))
                    deep = cfg.max_depth >= 2 and cfg.deep_buckets >= 1
                    if cfg.max_depth > 0:
                        n_a = 1 if deep else cfg.max_depth    # levels at cap width
                        xs = jnp.arange(n_a) == cfg.max_depth - 1
                        carry, _ = lax.scan(_level_ckpt(cfg)(step_merged), carry, xs)
                    if deep:
                        return deep_phase(carry)
                    coeff_d, accum, nrays_d = carry[2], carry[6], carry[7]
                else:
                    carry = (ro_r, rd_r, coeff_r, accum, jnp.zeros((), jnp.float32))
                    if cfg.max_depth > 0:
                        carry, _ = lax.scan(_level_ckpt(cfg)(step), carry, None,
                                            length=cfg.max_depth)
                    coeff_d, accum, nrays_d = carry[2], carry[3], carry[4]
                # depth-exceeded → background
                accum = put(accum, coeff_d * scene.background[None])
                return accum.reshape(r, 3), nrays_d
            return br

        b = jnp.sum(cnt > caps_arr)
        # the whole compacted level-0 region (attrs + merged query + shading)
        # is also checkpointed: its saved residuals otherwise dominate the
        # backward's memory at full-bucket widths
        accum, nrays_d = lax.switch(b, [_level_ckpt(cfg)(branch(c)) for c in caps],
                                    (t0, fam0, idx0, coeff))
        return (accum, nrays0 + nrays_d) if with_stats else accum

    # ---- branching (dielectric) mode: flat compacted 2W-wide wavefront ----
    # (replaces an unrolled binary ray tree: 2^depth full-width queries with
    # inline shadow queries; see _branch_levels)
    r = ro.shape[0]
    tile = WAVEFRONT_TILE
    nt = r // tile if r % tile == 0 else 0

    if not (cfg.compact_levels and nt >= 4):
        pix = jnp.arange(r, dtype=jnp.int32)
        accum = jnp.zeros_like(ro)
        carry = _branch_entry(scene, ro, rd, coeff, pix, accum, cfg, pack,
                              count_rays, feat0=feat0)
        accum, nrays, dropped = _branch_levels(scene, cfg, pack, carry,
                                               count_rays)
        if debug_stats is not None:
            debug_stats["dropped_children_coeff"] = dropped
        return (accum, nrays) if with_stats else accum

    # hit-tile compaction at level 0, as in the non-branching path: the only
    # full-width pass is the level-0 query; all differentiable shading and
    # every deeper bounce runs at the gathered hit-tile width
    t0, fam0, idx0 = closest_query(scene, ro, rd, cfg, pack=pack, feat=feat0)
    active0 = jnp.any(coeff > 0.0, axis=-1)
    valid0 = (fam0 != FAM_NONE) & active0
    nrays0 = (jnp.sum(active0.astype(jnp.float32))
              + nl * jnp.sum(valid0.astype(jnp.float32)))
    accum0 = jnp.where((active0 & (fam0 == FAM_NONE))[:, None],
                       coeff * scene.background[None], 0.0)
    hit_tl = jnp.any(valid0.reshape(nt, tile), axis=1)
    cnt = jnp.sum(hit_tl, dtype=jnp.int32)
    caps = sorted({-(-nt // 4 ** k) for k in range(max(cfg.compact_buckets, 1))})
    caps_arr = jnp.asarray(caps, jnp.int32)

    def branch(cap: int):
        def br(operand):
            t0, fam0, idx0, coeff_f, accum0 = operand
            tidx = jnp.nonzero(hit_tl, size=cap, fill_value=nt)[0].astype(jnp.int32)
            tsafe = jnp.minimum(tidx, nt - 1)

            def g3(x):
                return x.reshape(nt, tile, 3)[tsafe].reshape(cap * tile, 3)

            def g1(x):
                return x.reshape(nt, tile)[tsafe].reshape(cap * tile)

            ro_c, rd_c, coeff_c = g3(ro), g3(rd), g3(coeff_f)
            t_c, fam_c, idx_c = g1(t0), g1(fam0), g1(idx0)
            padlive = jnp.repeat(tidx < nt, tile)
            coeff_c = jnp.where(padlive[:, None], coeff_c, 0.0)
            fam_c = jnp.where(padlive, fam_c, FAM_NONE)
            # TILE-granular wavefront: children inherit their parent's lane,
            # so tiles never mix pixels — contributions scatter per TILE
            # through the tidx/tile_pix maps and children compact per tile
            # (the former per-lane pix machinery profiled ~375ms/frame;
            # docs/KERNEL.md round-4). Level 0 was already counted at FULL
            # width in nrays0 — the entry must not recount it.
            carry = _branch_entry_tiles(scene, ro_c, rd_c, coeff_c, tidx, nt,
                                        accum0.reshape(nt, tile, 3), cfg,
                                        pack, count_rays,
                                        q0=(t_c, fam_c, idx_c.astype(jnp.int32)))
            accum_t, nrays_d, dropped = _branch_rung_ladder(
                scene, cfg, pack, carry, count_rays, nt)
            return accum_t.reshape(r, 3), nrays_d, dropped
        return br

    b = jnp.sum(cnt > caps_arr)
    accum, nrays_d, dropped = lax.switch(
        b, [_level_ckpt(cfg)(branch(c)) for c in caps],
        (t0, fam0, idx0, coeff, accum0))
    if debug_stats is not None:
        debug_stats["dropped_children_coeff"] = dropped
    return (accum, nrays0 + nrays_d) if with_stats else accum
