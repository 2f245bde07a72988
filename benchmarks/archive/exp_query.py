"""Throwaway experiment: decompose the full-width (1080p) closest_query cost:
features build, chunk mask+argsort, pallas sweep, and the whole query.
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

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
    from realtrace_tpu.core.types import RenderConfig
    from realtrace_tpu.ops import accel
    from realtrace_tpu.ops.pallas import trace as pt
    from realtrace_tpu.render.pipeline import _tiled_rays

    cfg = RenderConfig(max_depth=3, accel="pallas", chunk_size=64)
    scene, cam = scenes.serial_obj_scene(
        texture_path="/root/reference/Serial/bob_diffuse.png", dtype=jnp.float32)
    scene = accel.with_chunks(scene, cfg)
    camera = scenes.make_camera(cam, 1920, 1080, dtype=jnp.float32)
    ro, rd, coeff, _ = _tiled_rays(camera)
    jax.block_until_ready((ro, rd))
    pack = pt.build_pack(scene, cfg)
    jax.block_until_ready(pack.b)

    nt = ro.shape[0] // pt.LANES
    print(f"nt={nt} resident={pack.resident} M={pack.meta.shape[0]}")

    feat = timeit("_features (2M rays)", jax.jit(pt._features), ro, rd)
    cl, entry, counts = timeit(
        "_chunk_mask + argsort (2040x167)",
        jax.jit(lambda o, d: pt._chunk_mask(o, d, pack.lo, pack.hi, nt)), ro, rd)
    print("mean chunks/tile:", float(jnp.mean(counts)), flush=True)

    f = jax.jit(lambda *a: pt._sweep(*a, cfg.chunk_size, float(cfg.det_epsilon),
                                     float(cfg.smallest_dist), False, False,
                                     cfg.matmul_precision, pack.resident))
    timeit("_sweep kernel (2040 tiles)", f, pack.meta, cl, counts, entry, feat, pack.b)

    zero_counts = jnp.zeros_like(counts)
    timeit("_sweep kernel all-empty (fixed cost)", f, pack.meta, cl, zero_counts,
           entry, feat, pack.b)

    g = jax.jit(lambda o, d: pt.closest_triangle(scene, o, d, cfg, pack=pack,
                                                 raw_idx=True))
    timeit("closest_triangle end-to-end", g, ro, rd)


if __name__ == "__main__":
    main()
