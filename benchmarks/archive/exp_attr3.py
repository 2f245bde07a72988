"""Throwaway: piecewise timing of hit_attributes internals at 2M rays.

Splits the (N,25) table gather from the triangle recompute and Hit assembly
to find the 20+ms of non-gather cost profile_parts revealed.
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp


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
    from realtrace_tpu.core import vec
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
    print(f"rays: {ro.shape[0]/1e6:.2f}M")

    q = jax.jit(lambda o, d: closest_query(scene, o, d, cfg, pack=pack))
    t_fwd, fam, idx = jax.block_until_ready(q(ro, rd))

    tm = scene.tri_materials

    def build_gather(idx):
        table = jnp.concatenate([
            scene.tri_vertices.reshape(-1, 9),
            scene.tri_colors.reshape(-1, 9),
            jnp.stack([tm.ka, tm.kd, tm.ks, tm.kr, tm.kt, tm.eta], axis=1),
        ], axis=1)
        perm = pack.perm
        table = jnp.concatenate([table[perm], perm.astype(jnp.float32)[:, None]], axis=1)
        return table[idx]

    g = timeit("table build + [perm] + [idx] gather", jax.jit(build_gather), idx)

    def recompute(g, ro, rd, fam, t_fwd):
        valid = fam != 0
        tv = g[:, 0:9].reshape(-1, 3, 3)
        tc = g[:, 9:18].reshape(-1, 3, 3)
        a, b, c = tv[:, 0], tv[:, 1], tv[:, 2]
        e1, e2 = a - b, a - c
        nrm = vec.cross(e1, e2)
        det = vec.dot(rd, nrm)
        det_safe = jnp.where(jnp.abs(det) > 0, det, 1.0)
        s = a - ro
        tt = vec.dot(s, nrm) / det_safe
        beta = vec.dot(rd, jnp.cross(s, e2)) / det_safe
        gamma = vec.dot(rd, jnp.cross(e1, s)) / det_safe
        alpha = 1.0 - beta - gamma
        col = alpha[:, None] * tc[:, 0] + beta[:, None] * tc[:, 1] + gamma[:, None] * tc[:, 2]
        pos = ro + tt[:, None] * rd
        return tt, nrm, col, pos

    timeit("tri recompute (from gathered g)", jax.jit(recompute), g, ro, rd, fam, t_fwd)

    ha = jax.jit(lambda o, d, t, f, i: hit_attributes(scene, o, d, t, f, i, cfg, pack=pack))
    timeit("hit_attributes total", ha, ro, rd, t_fwd, fam, idx)

    # gather+recompute fused in one jit (lets XLA fuse across)
    def fused(idx, ro, rd, fam, t_fwd):
        g = build_gather(idx)
        return recompute(g, ro, rd, fam, t_fwd)
    timeit("gather+recompute one jit", jax.jit(fused), idx, ro, rd, fam, t_fwd)




def main2():
    # rerun fused with an optimization barrier after the gather
    from realtrace_tpu.apps import scenes
    from realtrace_tpu.core.types import RenderConfig
    from realtrace_tpu.ops import accel
    from realtrace_tpu.ops.intersect import closest_query, hit_attributes
    from realtrace_tpu.ops.pallas import trace as ptrace
    from realtrace_tpu.render.pipeline import _tiled_rays
    from realtrace_tpu.core import vec
    import jax.lax as lax

    cfg = RenderConfig(max_depth=3, accel="pallas", chunk_size=64)
    scene, cam = scenes.serial_obj_scene(
        texture_path="/root/reference/Serial/bob_diffuse.png", dtype=jnp.float32)
    scene = accel.with_chunks(scene, cfg)
    camera = scenes.make_camera(cam, 1920, 1080, dtype=jnp.float32)
    ro, rd, _, _ = _tiled_rays(camera)
    pack = ptrace.build_pack(scene, cfg)
    q = jax.jit(lambda o, d: closest_query(scene, o, d, cfg, pack=pack))
    t_fwd, fam, idx = jax.block_until_ready(q(ro, rd))
    tm = scene.tri_materials

    def fused_barrier(idx, ro, rd, fam, t_fwd):
        table = jnp.concatenate([
            scene.tri_vertices.reshape(-1, 9),
            scene.tri_colors.reshape(-1, 9),
            jnp.stack([tm.ka, tm.kd, tm.ks, tm.kr, tm.kt, tm.eta], axis=1),
        ], axis=1)
        perm = pack.perm
        table = jnp.concatenate([table[perm], perm.astype(jnp.float32)[:, None]], axis=1)
        g = lax.optimization_barrier(table[idx])
        tv = g[:, 0:9].reshape(-1, 3, 3)
        tc = g[:, 9:18].reshape(-1, 3, 3)
        a, b, c = tv[:, 0], tv[:, 1], tv[:, 2]
        e1, e2 = a - b, a - c
        nrm = vec.cross(e1, e2)
        det = vec.dot(rd, nrm)
        det_safe = jnp.where(jnp.abs(det) > 0, det, 1.0)
        s = a - ro
        tt = vec.dot(s, nrm) / det_safe
        beta = vec.dot(rd, jnp.cross(s, e2)) / det_safe
        gamma = vec.dot(rd, jnp.cross(e1, s)) / det_safe
        alpha = 1.0 - beta - gamma
        col = alpha[:, None] * tc[:, 0] + beta[:, None] * tc[:, 1] + gamma[:, None] * tc[:, 2]
        pos = ro + tt[:, None] * rd
        return tt, nrm, col, pos

    timeit("gather+recompute + opt barrier", jax.jit(fused_barrier), idx, ro, rd, fam, t_fwd)


if __name__ == "__main__":
    main2()
