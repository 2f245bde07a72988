"""Throwaway: where do hit_attributes' ~27ms go at 2M rays?

Times the raw (R,25) row gather, the elementwise recompute alone, and some
gather variants (padded row width, split-by-column, take_along_axis).
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(name, fn, *args):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(10):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:45s} {(time.perf_counter()-t0)/10*1e3:8.2f} ms")
    return out


def main():
    from realtrace_tpu.apps import scenes
    from realtrace_tpu.core.types import RenderConfig
    from realtrace_tpu.ops import accel
    from realtrace_tpu.ops.intersect import closest_query, hit_attributes
    from realtrace_tpu.ops.pallas import trace as ptrace
    from realtrace_tpu.render.pipeline import _tiled_rays

    cfg = RenderConfig(max_depth=3, accel="pallas", chunk_size=64)
    scene, cam = scenes.serial_obj_scene(
        texture_path="/root/reference/Serial/bob_diffuse.png", dtype=jnp.float32)
    scene = accel.with_chunks(scene, cfg)
    camera = scenes.make_camera(cam, 1920, 1080, dtype=jnp.float32)
    ro, rd, _, _ = _tiled_rays(camera)
    pack = ptrace.build_pack(scene, cfg)
    r = ro.shape[0]
    print(f"rays: {r/1e6:.2f}M")

    q = jax.jit(lambda o, d: closest_query(scene, o, d, cfg, pack=pack))
    t_fwd, fam, idx = timeit("closest_query", q, ro, rd)

    n = scene.n_triangles
    key = jax.random.PRNGKey(0)
    table25 = jax.random.normal(key, (n, 25), jnp.float32)
    table32 = jax.random.normal(key, (n, 32), jnp.float32)

    timeit("raw gather (N,25)[idx]", jax.jit(lambda t, i: t[i]), table25, idx)
    timeit("raw gather (N,32)[idx]", jax.jit(lambda t, i: t[i]), table32, idx)
    timeit("raw gather (N,8)[idx]", jax.jit(lambda t, i: t[i]), table32[:, :8], idx)

    # sorted-idx gather (tile-coherent rays hit coherent triangles?)
    sidx = jnp.sort(idx)
    timeit("raw gather (N,25)[sorted idx]", jax.jit(lambda t, i: t[i]), table25, sidx)

    ha = jax.jit(lambda o, d, t, f, i: hit_attributes(scene, o, d, t, f, i, cfg, pack=pack))
    timeit("hit_attributes total", ha, ro, rd, t_fwd, fam, idx)


if __name__ == "__main__":
    main()
