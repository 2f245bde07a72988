"""Per-stage TPU timing breakdown of the bob 1080p frame.

Times each pipeline stage in isolation (sweep kernel, chunk mask, features,
attribute recompute, shading) so optimization work targets the real costs.
Not a driver benchmark — a development tool (see bench.py for the headline).

Usage: python benchmarks/profile_parts.py  (TPU; slow first compile)
Env: RT_PROF_PRECISION=highest|high|default, RT_PROF_CHUNK=64
"""
from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
from jax import lax

N_REPEAT = 10


def timeit(name, fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(N_REPEAT):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / N_REPEAT * 1e3
    print(f"{name:45s} {dt:8.2f} ms")
    return out


def main():
    from realtrace_tpu.apps import scenes
    from realtrace_tpu.core.types import RenderConfig
    from realtrace_tpu.ops import accel
    from realtrace_tpu.ops.intersect import closest_hit
    from realtrace_tpu.ops.pallas import trace as ptrace
    from realtrace_tpu.render import shade

    width, height = 1920, 1080
    precision = os.environ.get("RT_PROF_PRECISION", "highest")
    cfg = RenderConfig(max_depth=3, accel="pallas",
                       chunk_size=int(os.environ.get("RT_PROF_CHUNK", 64)),
                       matmul_precision=precision)
    scene, cam = scenes.serial_obj_scene(
        texture_path="/root/reference/Serial/bob_diffuse.png", dtype=jnp.float32)
    scene = accel.with_chunks(scene, cfg)
    camera = scenes.make_camera(cam, width, height, dtype=jnp.float32)

    from realtrace_tpu.render.pipeline import _tiled_rays
    ro, rd, _, _ = _tiled_rays(camera)
    print(f"rays: {ro.shape[0]/1e6:.2f}M  tris: {scene.n_triangles}  "
          f"chunk={cfg.chunk_size} precision={precision}")

    pack = ptrace.build_pack(scene, cfg)
    jax.block_until_ready(pack.b)

    # --- stage: features -------------------------------------------------
    feats = timeit("features (R,16)->(16,R)", jax.jit(ptrace._features), ro, rd)

    # --- stage: chunk mask + compaction -----------------------------------
    nt = ro.shape[0] // ptrace.LANES
    mask_fn = jax.jit(lambda o, d: ptrace._chunk_mask(o, d, pack.lo, pack.hi, nt))
    chunk_list, entry, counts = timeit("chunk mask + argsort compaction", mask_fn, ro, rd)
    print(f"    mean visible chunks/tile: {float(jnp.sum(counts))/nt:.2f} of {pack.lo.shape[0]}")

    # --- stage: sweep kernel (closest) ------------------------------------
    def sweep(feat, cl, ent, cnt):
        return ptrace._sweep(pack.meta, cl, cnt, ent, feat, pack.b, cfg.chunk_size,
                             float(cfg.det_epsilon), float(cfg.smallest_dist),
                             False, False, precision, pack.resident)
    t, idx = timeit("sweep kernel (closest, primary rays)", jax.jit(sweep), feats,
                    chunk_list, entry, counts)

    # --- stage: full closest query (features+mask+sweep+epilogue) ----------
    q = jax.jit(lambda o, d: ptrace.closest_triangle(scene, o, d, cfg, pack=pack, raw_idx=True))
    timeit("closest_triangle total", q, ro, rd)

    # --- stage: closest_hit (query + attribute recompute) ------------------
    ch = jax.jit(lambda o, d: closest_hit(scene, o, d, cfg, pack=pack))
    hit = timeit("closest_hit (query + attr recompute)", ch, ro, rd)

    # --- stage: local shading (phong + shadow sweep) -----------------------
    lc = jax.jit(lambda h, d: shade.local_color(scene, h, d, cfg, pack=pack))
    timeit("local_color (phong + shadow query)", lc, hit, rd)

    # --- whole frame -------------------------------------------------------
    wf = jax.jit(lambda o, d: shade.trace_wavefront(scene, o, d, cfg, branching=False,
                                                    with_stats=True))
    _, nrays = timeit(f"trace_wavefront depth-{cfg.max_depth}", wf, ro, rd)
    print(f"    rays/frame: {float(nrays)/1e6:.2f}M")


if __name__ == "__main__":
    main()
