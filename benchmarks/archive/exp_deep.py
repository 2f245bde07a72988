"""Throwaway experiment: decompose ONE deep bounce level at compact width
(the real level-1 wavefront of the 1080p bob frame): sweep query, attribute
recompute, shadow query, Phong, child math, contribution scatter, reorder.
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
    from realtrace_tpu.core.types import WAVEFRONT_TILE, RenderConfig
    from realtrace_tpu.ops import accel
    from realtrace_tpu.ops.intersect import (FAM_NONE, closest_query,
                                             hit_attributes)
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

    # ---- build the real level-1 compact wavefront -------------------------
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
        return ro_r, rd_r, coeff_r, tidx, jnp.sum(hit_tl)

    ro1, rd1, coeff1, tidx, nhit = level0(ro, rd, coeff)
    jax.block_until_ready(ro1)
    live1 = jnp.any(coeff1 > 0, -1)
    print(f"nt={nt} cap={cap} hit_tiles={int(nhit)} live_lanes_l1={int(live1.sum())}")

    cl, entry, counts = pt._chunk_mask(ro1, rd1, pack.lo, pack.hi, cap)
    print("level-1 mean chunks/tile:", float(counts.sum()) / cap, flush=True)

    # ---- components at compact width --------------------------------------
    timeit("closest_query (sweep) @cap", jax.jit(
        lambda o, d: closest_query(scene, o, d, cfg, pack=pack)), ro1, rd1)

    t1, fam1, idx1 = jax.jit(lambda o, d: closest_query(scene, o, d, cfg, pack=pack))(ro1, rd1)
    timeit("hit_attributes @cap", jax.jit(
        lambda o, d, t, f, i: hit_attributes(scene, o, d, t, f, i, cfg, pack=pack)),
        ro1, rd1, t1, fam1, idx1)

    hit1 = jax.jit(lambda o, d, t, f, i: hit_attributes(scene, o, d, t, f, i, cfg, pack=pack))(
        ro1, rd1, t1, fam1, idx1)

    timeit("shadow_mask @cap", jax.jit(
        lambda hp, lv: shade.shadow_mask(scene, hp, lv, cfg, pack=pack)),
        hit1.position, hit1.valid)

    timeit("local_color (phong+shadow) @cap", jax.jit(
        lambda h, d: shade.local_color(scene, h, d, cfg, pack=pack)), hit1, rd1)

    timeit("_children full @cap", jax.jit(
        lambda h, o, d, c: shade._children(scene, h, o, d, c, cfg, pack=pack)),
        hit1, ro1, rd1, coeff1)

    accum = jnp.zeros((nt, tile, 3), jnp.float32)
    contrib = jnp.ones((cap * tile, 3), jnp.float32)
    timeit("put scatter-add @cap", jax.jit(
        lambda a, x: a.at[tidx].add(x.reshape(cap, tile, 3), mode="drop",
                                    indices_are_sorted=True)), accum, contrib)

    timeit("coherence key+argsort+3perm @cap", jax.jit(
        lambda o, d, c, lv: tuple(
            x[jnp.argsort(shade._coherence_key(o, d, pack.scene_lo,
                                               pack.scene_hi, lv))]
            for x in (o, d, c))), ro1, rd1, coeff1, live1)

    # sweep with reordered rays: mask tightness
    order = jnp.argsort(shade._coherence_key(ro1, rd1, pack.scene_lo,
                                             pack.scene_hi, live1))
    ro1s, rd1s = ro1[order], rd1[order]
    cl2, entry2, counts2 = pt._chunk_mask(ro1s, rd1s, pack.lo, pack.hi, cap)
    print("level-1 SORTED mean chunks/tile:", float(counts2.sum()) / cap, flush=True)
    timeit("closest_query (sweep) @cap SORTED", jax.jit(
        lambda o, d: closest_query(scene, o, d, cfg, pack=pack)), ro1s, rd1s)


if __name__ == "__main__":
    main()
