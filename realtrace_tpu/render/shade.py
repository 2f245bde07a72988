"""Wavefront Whitted shading: the reference's recursive ``World::shade_ray``
(Serial/world.cpp:32-111) flattened into dense per-level wavefront steps.

Recursion → iteration: each bounce level processes ALL pixel rays as one dense
batch (``lax.scan`` when the ray count per level is constant — the no-dielectric
case — or an unrolled doubling tree for dielectric scenes, generalizing the
CUDA reference's static depth-2 / 7-buffer wavefront scheduler,
Parellel/kernel.cu:564-604). Dead rays are masked, never compacted — TPU lanes
prefer dense masked work over stream compaction (SURVEY §7 hard part (b)).

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


def _coherence_key(ro: Array, rd: Array, lo: Array, hi: Array, live: Array) -> Array:
    """uint32 sort key that re-tiles an incoherent secondary wavefront into
    spatially coherent 1024-ray tiles: Morton code of the quantized ray
    origin (coarse bits most significant) with the direction octant injected
    below them. Dead/parked lanes get the max key so they pack into all-dead
    tail tiles (zero accel work). Bounds ``lo``/``hi`` are the scene AABB.

    This is what keeps the interval chunk masks tight after a bounce: raw
    reflection wavefronts mix origins/directions within a pixel tile and the
    per-tile slab test degrades to ~all chunks (measured 61-95 of 167 on bob
    level>=1 vs 0.86 at level 0).
    """
    u32 = jnp.uint32
    ext = jnp.maximum(hi - lo, 1e-30)
    q = jnp.clip((ro - lo[None]) / ext[None] * 1023.0, 0.0, 1023.0).astype(u32)

    def spread(v):  # 10-bit -> every 3rd bit of 30
        v = (v | (v << u32(16))) & u32(0x030000FF)
        v = (v | (v << u32(8))) & u32(0x0300F00F)
        v = (v | (v << u32(4))) & u32(0x030C30C3)
        v = (v | (v << u32(2))) & u32(0x09249249)
        return v

    m = spread(q[:, 0]) | (spread(q[:, 1]) << u32(1)) | (spread(q[:, 2]) << u32(2))
    octant = ((rd[:, 0] > 0).astype(u32)
              | ((rd[:, 1] > 0).astype(u32) << u32(1))
              | ((rd[:, 2] > 0).astype(u32) << u32(2)))
    key = ((m >> u32(12)) << u32(12)) | (octant << u32(9)) | ((m >> u32(3)) & u32(0x1FF))
    return jnp.where(live, key, u32(0xFFFFFFFF))


def _park_dead(ro: Array, rd: Array, live: Array) -> tuple[Array, Array]:
    """Replace dead lanes' rays with a guaranteed-miss ray far outside the
    scene, pointing away. The wavefront stays dense (no compaction — SURVEY
    §7 hard part (b)) but the accel's chunk-visibility mask then assigns dead
    lanes zero intersection work."""
    park_o = jnp.full_like(ro, PARK_DISTANCE)
    park_d = jnp.zeros_like(rd).at[..., 0].set(1.0)
    return (jnp.where(live[:, None], ro, park_o),
            jnp.where(live[:, None], rd, park_d))


def shadow_mask(scene: Scene, hit_pos: Array, live: Array, cfg: RenderConfig,
                pack=None) -> Array:
    """True where ANY light's shadow ray is occluded.

    Ref: Serial/world.cpp:42-51 — shadow ray origin is offset by
    ``0.01*(lightPos-pos)`` along the *unnormalized* to-light vector; any hit
    (even beyond the light) counts as shadow, which we reproduce.
    """
    occ = jnp.zeros((hit_pos.shape[0],), bool)
    lp = scene.lights.position
    for l in range(lp.shape[0]):
        to_light = lp[l][None, :] - hit_pos
        origin = hit_pos + cfg.shadow_origin_bias * to_light
        direction = vec.normalize(to_light)
        origin, direction = _park_dead(origin, direction, live)
        occ |= any_hit(scene, origin, direction, cfg, pack=pack)
    return occ


def local_color(scene: Scene, hit: Hit, rd: Array, cfg: RenderConfig,
                live: Array | None = None, pack=None) -> Array:
    """Direct (local) shade at a hit: Phong + ambient, with the reference's
    shadow blend ``final*1e-4 + shadowColor*(1-1e-4)``.

    ``live`` marks lanes whose result is actually used — dead lanes' shadow
    rays are parked (zero accel work), their output is masked by the caller.
    Ref: Serial/world.cpp:40-63.
    """
    if live is None:
        live = hit.valid
    lc = light_shade(hit.position, hit.normal, rd, hit.color, hit.kd, hit.ks, scene, cfg)
    amb = scene.ambient[None, :] * hit.color * hit.ka[:, None]
    lc = lc + amb
    if cfg.shadows and scene.lights.position.shape[0]:
        sh = shadow_mask(scene, lax.stop_gradient(hit.position),
                         lax.stop_gradient(live), cfg, pack=pack)
        b = cfg.shadow_blend
        lc = jnp.where(sh[:, None], lc * b + amb * (1.0 - b), lc)
    return lc


def _children(scene: Scene, hit: Hit, ro: Array, rd: Array, coeff: Array,
               cfg: RenderConfig, pack=None, miss_background: bool = True):
    """One wavefront step: local contribution + (reflect, refract) children.

    Returns (contrib, (ro_r, rd_r, coeff_r), (ro_t, rd_t, coeff_t)).
    Mirrors the three branches of Serial/world.cpp:77-109:
      * dielectric (kr>0 && kt>0): Fresnel–Schlick split, Beer attenuation on
        exit, no local contribution;
      * reflective (kr>0): local + kr * child;
      * plain: local only.
    """
    dt = ro.dtype
    active = jnp.any(coeff > 0.0, axis=-1)
    valid = hit.valid & active

    i = vec.normalize(rd)
    n = vec.normalize(hit.normal)
    is_diel = valid & (hit.kr > 0.0) & (hit.kt > 0.0)
    is_refl = valid & (hit.kr > 0.0) & ~is_diel

    lc = local_color(scene, hit, rd, cfg, live=valid, pack=pack)
    # miss → background; dielectric → no local term (Serial/world.cpp:100 returns children only)
    contrib = jnp.where(valid[:, None] & ~is_diel[:, None], coeff * lc, 0.0)
    if miss_background:
        contrib = contrib + jnp.where((active & ~hit.valid)[:, None],
                                      coeff * scene.background[None], 0.0)

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
    return contrib, (ro_r, rd_r, coeff_r), (ro_t, rd_t, coeff_t)


def trace_wavefront(scene: Scene, ro: Array, rd: Array, cfg: RenderConfig,
                    branching: bool | None = None, coeff: Array | None = None,
                    with_stats: bool = False):
    """Trace a wavefront of rays to completion; returns accumulated color
    (R,3) and, optionally, the traced-ray count (for Mrays/s accounting).

    ``branching=None`` auto-selects: dielectric scenes get a binary ray tree
    unrolled for ``cfg.split_depth`` levels then reflection-only continuation;
    otherwise a constant-lane ``lax.scan`` over ``cfg.max_depth+1`` levels.
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
            def step(carry, _):
                ro, rd, coeff, accum, nrays = carry
                hit = closest_hit(scene, ro, rd, cfg, pack=pack)
                nrays = nrays + count_rays(coeff, hit)
                contrib, (ro_r, rd_r, coeff_r), _ = _children(scene, hit, ro, rd, coeff,
                                                              cfg, pack=pack)
                return (ro_r, rd_r, coeff_r, accum + contrib, nrays), None

            init = (ro, rd, coeff, jnp.zeros_like(ro), jnp.zeros((), jnp.float32))
            (ro_f, rd_f, coeff_f, accum, nrays), _ = lax.scan(step, init, None, length=cfg.max_depth + 1)
            accum = accum + coeff_f * scene.background[None]   # depth-exceeded → background
            return (accum, nrays) if with_stats else accum

        # ---- compacted levels: deep bounces run at a fraction of the width.
        # After the first bounce most tiles carry zero energy; gathering the
        # live tiles into the smallest power-of-two capacity >= live count
        # (lax.switch over static bucket widths) shrinks EVERY dense XLA op
        # (attribute recompute, Phong, child-ray math) with the wavefront,
        # not just the accel kernel. Exact: tiles are only skipped when all
        # their lanes carry zero coefficient.
        caps = [nt]
        for _ in range(max(cfg.compact_buckets - 1, 0)):
            nxt = (caps[-1] + 1) // 2
            if nxt == caps[-1]:
                break
            caps.append(nxt)
        caps_arr = jnp.asarray(caps[1:], jnp.int32)

        def branch(cap: int):
            def br(operand):
                ro_f, rd_f, coeff_f, accum, tl, pos, cnt = operand
                tidx = jnp.nonzero(tl, size=cap, fill_value=0)[0].astype(jnp.int32)

                def g3(x):
                    return x.reshape(nt, tile, 3)[tidx].reshape(cap * tile, 3)

                ro_c, rd_c, coeff_c = g3(ro_f), g3(rd_f), g3(coeff_f)
                # capacity slots beyond the live count duplicate tile 0: kill
                # their energy and park their rays (zero contribution + work)
                padlive = jnp.repeat(jnp.arange(cap, dtype=jnp.int32) < cnt, tile)
                coeff_c = jnp.where(padlive[:, None], coeff_c, 0.0)
                lane_live = padlive & jnp.any(coeff_c > 0.0, axis=-1)
                ro_c, rd_c = _park_dead(ro_c, rd_c, lane_live)

                # secondary wavefronts are incoherent within pixel tiles:
                # re-tile by spatial coherence key so the accel's interval
                # masks stay tight (and dead lanes pack into dead tail tiles)
                reorder = (pack is not None and cfg.reorder_secondary
                           and cap * 4 <= nt)
                if reorder:
                    key = _coherence_key(lax.stop_gradient(ro_c),
                                         lax.stop_gradient(rd_c),
                                         pack.scene_lo, pack.scene_hi, lane_live)
                    order = jnp.argsort(key).astype(jnp.int32)
                    inv_order = jnp.zeros_like(order).at[order].set(
                        jnp.arange(order.shape[0], dtype=jnp.int32))
                    ro_c, rd_c, coeff_c = ro_c[order], rd_c[order], coeff_c[order]

                # level 0 runs full width but typically hits few tiles (bob at
                # 1080p: 106 of 2040) — compact the EXPENSIVE differentiable
                # part (attribute recompute + Phong + shadow query + child
                # math) to the hit tiles with an inner switch, keeping only
                # the forward query + background blend at full width.
                inner = cap == nt and nt >= 16 and not reorder
                if inner:
                    t_f, fam, idx = closest_query(scene, ro_c, rd_c, cfg, pack=pack)
                    active = jnp.any(coeff_c > 0.0, axis=-1)
                    validm = (fam != FAM_NONE) & active
                    n_traced = (jnp.sum(active.astype(jnp.float32))
                                + nl * jnp.sum(validm.astype(jnp.float32)))
                    hit_tl = jnp.any(validm.reshape(cap, tile), axis=1)
                    cnt2 = jnp.sum(hit_tl, dtype=jnp.int32)
                    pos2 = jnp.cumsum(hit_tl.astype(jnp.int32)) - 1
                    caps2 = [cap]
                    while len(caps2) < 4:
                        nxt = max((caps2[-1] + 3) // 4, 1)
                        if nxt == caps2[-1]:
                            break
                        caps2.append(nxt)
                    caps2_arr = jnp.asarray(caps2[1:], jnp.int32)

                    def branch2(c2: int):
                        def br2(op):
                            ro_i, rd_i, coeff_i, t_i, fam_i, idx_i = op
                            tidx2 = jnp.nonzero(hit_tl, size=c2, fill_value=0)[0].astype(jnp.int32)

                            def g3b(x):
                                return x.reshape(cap, tile, 3)[tidx2].reshape(c2 * tile, 3)

                            def g1b(x):
                                return x.reshape(cap, tile)[tidx2].reshape(c2 * tile)

                            ro2, rd2, coeff2 = g3b(ro_i), g3b(rd_i), g3b(coeff_i)
                            t2, fam2, idx2 = g1b(t_i), g1b(fam_i), g1b(idx_i)
                            padlive2 = jnp.repeat(jnp.arange(c2, dtype=jnp.int32) < cnt2, tile)
                            coeff2 = jnp.where(padlive2[:, None], coeff2, 0.0)
                            fam2 = jnp.where(padlive2, fam2, FAM_NONE)
                            hit2 = hit_attributes(scene, ro2, rd2, t2, fam2, idx2,
                                                  cfg, pack=pack)
                            contrib2, (ror, rdr, cr), _ = _children(
                                scene, hit2, ro2, rd2, coeff2, cfg, pack=pack,
                                miss_background=False)
                            posc2 = jnp.clip(pos2, 0, c2 - 1)

                            def back2(xc, default):
                                xt = xc.reshape(c2, tile, 3)[posc2]
                                return jnp.where(hit_tl[:, None, None], xt,
                                                 default).reshape(cap * tile, 3)

                            park2 = jnp.zeros((3,), ro_i.dtype).at[0].set(1.0)
                            return (back2(contrib2, 0.0),
                                    back2(ror, jnp.asarray(PARK_DISTANCE, ro_i.dtype)),
                                    back2(rdr, park2[None, None, :]),
                                    back2(cr, 0.0))
                        return br2

                    b2 = (jnp.sum(cnt2 <= caps2_arr) if len(caps2) > 1
                          else jnp.zeros((), jnp.int32))
                    contrib, ro_rc, rd_rc, coeff_rc = lax.switch(
                        b2, [branch2(c2) for c2 in caps2],
                        (ro_c, rd_c, coeff_c, t_f, fam, idx))
                    # background for every active miss (inside or outside hit
                    # tiles — the inner _children skips it)
                    miss = active & (fam == FAM_NONE)
                    contrib = contrib + jnp.where(miss[:, None],
                                                  coeff_c * scene.background[None], 0.0)
                else:
                    hit = closest_hit(scene, ro_c, rd_c, cfg, pack=pack)
                    n_traced = count_rays(coeff_c, hit)
                    contrib, (ro_rc, rd_rc, coeff_rc), _ = _children(
                        scene, hit, ro_c, rd_c, coeff_c, cfg, pack=pack)
                    if reorder:
                        contrib, ro_rc, rd_rc, coeff_rc = (
                            contrib[inv_order], ro_rc[inv_order],
                            rd_rc[inv_order], coeff_rc[inv_order])

                # scatter-back as a gather (duplicate-free, deterministic):
                # full tile i reads compacted slot pos[i] when live
                posc = jnp.clip(pos, 0, cap - 1)

                def back(xc, default):
                    xt = xc.reshape(cap, tile, 3)[posc]          # (nt, tile, 3)
                    return jnp.where(tl[:, None, None], xt, default).reshape(r, 3)

                park_d = jnp.zeros((3,), ro_f.dtype).at[0].set(1.0)
                return (back(ro_rc, jnp.asarray(PARK_DISTANCE, ro_f.dtype)),
                        back(rd_rc, park_d[None, None, :]),
                        back(coeff_rc, 0.0),
                        accum + back(contrib, 0.0),
                        n_traced)
            return br

        branches = [branch(c) for c in caps]

        def step(carry, _):
            ro_f, rd_f, coeff_f, accum, nrays = carry
            live = jnp.any(coeff_f > 0.0, axis=-1)
            tl = jnp.any(live.reshape(nt, tile), axis=1)
            cnt = jnp.sum(tl, dtype=jnp.int32)
            pos = jnp.cumsum(tl.astype(jnp.int32)) - 1
            b = jnp.sum(cnt <= caps_arr) if len(caps) > 1 else jnp.zeros((), jnp.int32)
            ro_n, rd_n, coeff_n, accum, n_traced = lax.switch(
                b, branches, (ro_f, rd_f, coeff_f, accum, tl, pos, cnt))
            return (ro_n, rd_n, coeff_n, accum, nrays + n_traced), None

        init = (ro, rd, coeff, jnp.zeros_like(ro), jnp.zeros((), jnp.float32))
        (ro_f, rd_f, coeff_f, accum, nrays), _ = lax.scan(step, init, None, length=cfg.max_depth + 1)
        accum = accum + coeff_f * scene.background[None]   # depth-exceeded → background
        return (accum, nrays) if with_stats else accum

    # ---- branching (dielectric) mode: unrolled doubling tree -------------
    rays = [(ro, rd, coeff)]
    accum = jnp.zeros_like(ro)
    nrays = jnp.zeros((), jnp.float32)
    for level in range(cfg.max_depth + 1):
        new_rays = []
        for (o, d, cf) in rays:
            hit = closest_hit(scene, o, d, cfg, pack=pack)
            nrays = nrays + count_rays(cf, hit)
            contrib, child_r, child_t = _children(scene, hit, o, d, cf, cfg, pack=pack)
            accum = accum + contrib
            new_rays.append(child_r)
            if level < cfg.split_depth:
                new_rays.append(child_t)
            else:
                # beyond split_depth: fold refraction energy into nothing
                # (reflection-only continuation); energy conservation checked
                # in tests for split_depth >= scene needs.
                pass
        rays = new_rays
        if level == cfg.max_depth:
            for (o, d, cf) in rays:
                accum = accum + cf * scene.background[None]
            rays = []
    return (accum, nrays) if with_stats else accum
