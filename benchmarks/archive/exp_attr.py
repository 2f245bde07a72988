"""Throwaway experiment: isolate the closest_hit attribute-recompute cost.

profile_parts.py showed closest_triangle=13.7ms but closest_hit=40.2ms; the
standalone gather microbenchmark can't reproduce the 26ms delta (the remote
runtime overlaps/caches independent executions). Here each variant is timed
as one jitted chain of L=4 DEPENDENT repetitions (output feeds input), so the
measured time is honestly 4x the per-call cost.
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

L = 4


def timeit(name, fn, *args):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(3):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / 3 / L * 1e3
    print(f"{name:50s} {dt:8.2f} ms/call")


def main():
    from realtrace_tpu.apps import scenes
    from realtrace_tpu.core.types import RenderConfig
    from realtrace_tpu.ops import accel
    from realtrace_tpu.ops.intersect import closest_hit
    from realtrace_tpu.ops.pallas import trace as ptrace

    width, height = 1920, 1080
    cfg = RenderConfig(max_depth=3, accel="pallas", chunk_size=64)
    scene, cam = scenes.serial_obj_scene(
        texture_path="/root/reference/Serial/bob_diffuse.png", dtype=jnp.float32)
    scene = accel.with_chunks(scene, cfg)
    camera = scenes.make_camera(cam, width, height, dtype=jnp.float32)
    from realtrace_tpu.render.pipeline import _tiled_rays
    ro, rd, _, _ = _tiled_rays(camera)
    pack = ptrace.build_pack(scene, cfg)
    jax.block_until_ready(pack.b)

    def chain(body):
        def f(ro, rd):
            acc = jnp.zeros((), jnp.float32)
            o = ro
            for _ in range(L):
                s = body(o, rd)
                acc = acc + s
                o = ro + (s * 1e-20)    # dependency: next call waits on s
            return acc
        return jax.jit(f)

    # 1. query only
    def q_only(o, d):
        t, idx = ptrace.closest_triangle(scene, o, d, cfg, pack=pack, raw_idx=True)
        return jnp.sum(t * 0.0) + jnp.sum(idx.astype(jnp.float32)) * 1e-20

    timeit("query only (t, idx)", chain(q_only), ro, rd)

    # 2. query + wide row gather (no arithmetic)
    tm = scene.tri_materials
    table = jnp.concatenate([
        scene.tri_vertices.reshape(-1, 9),
        scene.tri_colors.reshape(-1, 9),
        jnp.stack([tm.ka, tm.kd, tm.ks, tm.kr, tm.kt, tm.eta], axis=1),
    ], axis=1)
    tbl_sorted = jnp.concatenate(
        [table[pack.perm], pack.perm.astype(jnp.float32)[:, None]], axis=1)

    def q_gather(o, d):
        t, idx = ptrace.closest_triangle(scene, o, d, cfg, pack=pack, raw_idx=True)
        g = tbl_sorted[jnp.maximum(idx, 0)]
        return jnp.sum(g) * 1e-20 + jnp.sum(t * 0.0)

    timeit("query + (N,25) row gather", chain(q_gather), ro, rd)

    # 3. full closest_hit
    def q_full(o, d):
        h = closest_hit(scene, o, d, cfg, pack=pack)
        return (jnp.sum(h.color) + jnp.sum(h.normal) + jnp.sum(h.t * 0.0)
                + jnp.sum(h.ka)) * 1e-20

    timeit("full closest_hit", chain(q_full), ro, rd)


if __name__ == "__main__":
    main()
