"""Throwaway experiment: how tight could deep-level chunk masks be?

On the real level-1 bob wavefront, compare:
  * interval per-tile mask (current)      — mean chunks/tile
  * EXACT per-ray slab test              — mean chunks/ray (lower bound)
  * exact per-tile union                 — mean chunks/tile
  * exact union after sorting rays by their front-most visible chunk
and the XLA cost of the exact test + sort.
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
from jax import lax

N = 20


def timeit(name, fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(N):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:55s} {(time.perf_counter()-t0)/N*1e3:8.2f} ms", flush=True)
    return out


def main():
    from realtrace_tpu.apps import scenes
    from realtrace_tpu.core.types import PARK_DISTANCE, WAVEFRONT_TILE, RenderConfig
    from realtrace_tpu.ops import accel
    from realtrace_tpu.ops.intersect import BIG, FAM_NONE, closest_query, hit_attributes
    from realtrace_tpu.ops.pallas import trace as pt
    from realtrace_tpu.render import shade
    from realtrace_tpu.render.pipeline import _tiled_rays

    cfg = RenderConfig(max_depth=3, accel="pallas", chunk_size=64)
    scene, cam = scenes.serial_obj_scene(
        texture_path="/root/reference/Serial/bob_diffuse.png", dtype=jnp.float32)
    scene = accel.with_chunks(scene, cfg)
    camera = scenes.make_camera(cam, 1920, 1080, dtype=jnp.float32)
    ro, rd, coeff, _ = _tiled_rays(camera)
    if coeff is None:
        coeff = jnp.ones_like(ro)
    pack = pt.build_pack(scene, cfg)
    tile = WAVEFRONT_TILE
    nt = ro.shape[0] // tile
    cap = -(-nt // 16)

    @jax.jit
    def level0(ro, rd, coeff):
        t0, fam0, idx0 = closest_query(scene, ro, rd, cfg, pack=pack)
        valid0 = (fam0 != FAM_NONE) & jnp.any(coeff > 0, -1)
        hit_tl = jnp.any(valid0.reshape(nt, tile), axis=1)
        tidx = jnp.nonzero(hit_tl, size=cap, fill_value=nt)[0].astype(jnp.int32)
        tsafe = jnp.minimum(tidx, nt - 1)
        g3 = lambda x: x.reshape(nt, tile, 3)[tsafe].reshape(cap * tile, 3)
        g1 = lambda x: x.reshape(nt, tile)[tsafe].reshape(cap * tile)
        ro_c, rd_c, coeff_c = g3(ro), g3(rd), g3(coeff)
        padlive = jnp.repeat(tidx < nt, tile)
        coeff_c = jnp.where(padlive[:, None], coeff_c, 0.0)
        fam_c = jnp.where(padlive, g1(fam0), FAM_NONE)
        hit0 = hit_attributes(scene, ro_c, rd_c, g1(t0), fam_c,
                              g1(idx0).astype(jnp.int32), cfg, pack=pack)
        _, (ro_r, rd_r, coeff_r), _ = shade._children(
            scene, hit0, ro_c, rd_c, coeff_c, cfg, pack=pack, miss_background=False)
        return ro_r, rd_r, coeff_r

    ro1, rd1, coeff1 = level0(ro, rd, coeff)
    jax.block_until_ready(ro1)
    live1 = jnp.any(coeff1 > 0, -1)
    R = ro1.shape[0]
    M = pack.lo.shape[0]
    print(f"cap={cap} R={R} live={int(live1.sum())} M={M}")

    def exact_rc(ro, rd, live):
        """Per-(ray, chunk) exact slab test + entry bound. (R, M) bool/f32."""
        inv = jnp.where(rd != 0.0, 1.0 / jnp.where(rd != 0.0, rd, 1.0), BIG)
        ta = (pack.lo[None] - ro[:, None]) * inv[:, None]     # (R, M, 3)
        tb = (pack.hi[None] - ro[:, None]) * inv[:, None]
        tn = jnp.minimum(ta, tb).max(-1)
        tf = jnp.maximum(ta, tb).min(-1)
        entry = jnp.maximum(tn, 0.0)
        vis = (tf >= entry) & live[:, None]
        return vis, entry

    vis, entry = jax.jit(exact_rc)(ro1, rd1, live1)
    per_ray = vis.sum(1)
    print("exact mean chunks/LIVE ray:",
          float(per_ray.sum()) / max(float(live1.sum()), 1))
    tile_union = jnp.any(vis.reshape(cap, tile, M), axis=1)
    print("exact tile-union mean chunks/tile:", float(tile_union.sum()) / cap)

    cl, ent, counts = pt._chunk_mask(ro1, rd1, pack.lo, pack.hi, cap)
    print("interval mean chunks/tile:", float(counts.sum()) / cap)

    # sort rays by front-most visible chunk id
    first = jnp.argmin(jnp.where(vis, entry, jnp.inf), axis=1)
    first = jnp.where(live1 & (per_ray > 0), first, M + 1)
    order = jnp.argsort(first.astype(jnp.int32)).astype(jnp.int32)
    viso = vis[order]
    tile_union_s = jnp.any(viso.reshape(cap, tile, M), axis=1)
    print("SORTED-by-first-chunk union mean chunks/tile:",
          float(tile_union_s.sum()) / cap)

    # costs
    timeit("exact per-ray vis (R x M)", jax.jit(exact_rc), ro1, rd1, live1)

    def tight_masks(ro, rd, live):
        vis, entry = exact_rc(ro, rd, live)
        first = jnp.argmin(jnp.where(vis, entry, jnp.inf), axis=1)
        first = jnp.where(live & (vis.sum(1) > 0), first, M + 1)
        order = jnp.argsort(first.astype(jnp.int32)).astype(jnp.int32)
        tu = jnp.any(vis[order].reshape(cap, tile, M), axis=1)
        ent_t = jnp.where(vis[order], entry[order], jnp.inf).reshape(cap, tile, M).min(1)
        o2 = jnp.argsort(jnp.where(tu, ent_t, jnp.inf), axis=1).astype(jnp.int32)
        cnts = tu.sum(1, dtype=jnp.int32)
        return order, o2, cnts
    timeit("full tight-mask pipeline (vis+sort+union)", jax.jit(tight_masks),
           ro1, rd1, live1)


if __name__ == "__main__":
    main()
