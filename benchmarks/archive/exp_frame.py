"""Throwaway experiment: where does the 1080p bob frame time actually go?

Times (on TPU):
  * trace_wavefront at depth 0..3, compact on/off
  * one scan `step` applied to level-0 and level-1 wavefront states
  * render_with_stats end-to-end pieces (ray-gen, buf gather, clip)
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import dataclasses

import jax
import jax.numpy as jnp

N = 10


def timeit(name, fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(N):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:50s} {(time.perf_counter()-t0)/N*1e3:8.2f} ms", flush=True)
    return out


def main():
    from realtrace_tpu.apps import scenes
    from realtrace_tpu.core.types import RenderConfig
    from realtrace_tpu.ops import accel
    from realtrace_tpu.render import shade
    from realtrace_tpu.render.pipeline import _tiled_rays, render_with_stats

    cfg = RenderConfig(max_depth=3, accel="pallas", chunk_size=64)
    scene, cam = scenes.serial_obj_scene(
        texture_path="/root/reference/Serial/bob_diffuse.png", dtype=jnp.float32)
    scene = accel.with_chunks(scene, cfg)
    camera = scenes.make_camera(cam, 1920, 1080, dtype=jnp.float32)
    ro, rd, coeff, _ = _tiled_rays(camera)
    if coeff is None:
        coeff = jnp.ones_like(ro)
    jax.block_until_ready((ro, rd))

    timeit("ray-gen (_tiled_rays)", jax.jit(lambda c: _tiled_rays(c)[:2]), camera)

    for d in (0, 1, 2, 3):
        c2 = dataclasses.replace(cfg, max_depth=d)
        f = jax.jit(lambda o, r, cc, _c2=c2: shade.trace_wavefront(
            scene, o, r, _c2, branching=False, coeff=cc, with_stats=True))
        timeit(f"trace_wavefront depth-{d} compact", f, ro, rd, coeff)

    c3 = dataclasses.replace(cfg, compact_levels=False)
    for d in (0, 3):
        c2 = dataclasses.replace(c3, max_depth=d)
        f = jax.jit(lambda o, r, cc, _c2=c2: shade.trace_wavefront(
            scene, o, r, _c2, branching=False, coeff=cc, with_stats=True))
        timeit(f"trace_wavefront depth-{d} NOcompact", f, ro, rd, coeff)

    f = jax.jit(lambda s, c: render_with_stats(s, c, cfg, branching=False))
    timeit("render_with_stats depth-3 (bench frame)", f, scene, camera)

    # ---- suspicion: full-width row gathers --------------------------------
    from realtrace_tpu.render.pipeline import _tile_maps
    import numpy as np
    ii, jj, valid, inv = _tile_maps(camera.width, camera.height)
    buf = jnp.zeros((ro.shape[0], 3), jnp.float32) + 0.5
    inv_j = jnp.asarray(inv)
    timeit("buf[inv] per-pixel row gather (2M rows)",
           jax.jit(lambda b: b[inv_j]), buf)

    th = tw = 32
    hp = -(-camera.height // th) * th
    wp = -(-camera.width // tw) * tw

    def blocked(b):
        x = b.reshape(hp // th, wp // tw, th, tw, 3)
        x = x.transpose(0, 2, 1, 3, 4).reshape(hp, wp, 3)
        return x[:camera.height, :camera.width]
    timeit("blocked transpose equivalent", jax.jit(blocked), buf)

    # per-level scatter-back: 2040-row gather of (1024,3) rows + where
    nt = ro.shape[0] // 1024
    posc = jnp.zeros((nt,), jnp.int32)
    tl = jnp.zeros((nt,), bool)

    def back(xc):
        xt = xc.reshape(128, 1024, 3)[posc]
        return jnp.where(tl[:, None, None], xt, 0.0).reshape(nt * 1024, 3)
    xc = jnp.zeros((128 * 1024, 3), jnp.float32)
    timeit("back() tile-row gather to full width (x1)", jax.jit(back), xc)


if __name__ == "__main__":
    main()
