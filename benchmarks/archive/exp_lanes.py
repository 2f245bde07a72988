"""Throwaway experiment: per-grid-step fixed cost vs kernel tile width.

query-only time is ~6.5us per 1024-ray tile while the actual chunk matmuls
are ~1us — the grid-step overhead dominates. Measures the closest query with
LANES = 1024 / 2048 / 4096 (monkeypatched) to size the win.
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

L = 4


def main():
    from realtrace_tpu.apps import scenes
    from realtrace_tpu.core.types import RenderConfig
    from realtrace_tpu.ops import accel
    from realtrace_tpu.ops.pallas import trace as ptrace

    width, height = 1920, 1080
    cfg = RenderConfig(max_depth=3, accel="pallas", chunk_size=64)
    scene, cam = scenes.serial_obj_scene(
        texture_path="/root/reference/Serial/bob_diffuse.png", dtype=jnp.float32)
    scene = accel.with_chunks(scene, cfg)
    camera = scenes.make_camera(cam, width, height, dtype=jnp.float32)
    from realtrace_tpu.render.pipeline import _tiled_rays
    ro, rd, _, _ = _tiled_rays(camera)

    for lanes in (1024, 2048, 4096):
        ptrace.LANES = lanes
        pack = ptrace.build_pack(scene, cfg)
        jax.block_until_ready(pack.b)

        def q_only(o, d):
            t, idx = ptrace.closest_triangle(scene, o, d, cfg, pack=pack, raw_idx=True)
            return jnp.sum(t * 0.0) + jnp.sum(idx.astype(jnp.float32)) * 1e-20

        def chained(ro, rd):
            acc = jnp.zeros((), jnp.float32)
            o = ro
            for _ in range(L):
                s = q_only(o, rd)
                acc = acc + s
                o = ro + (s * 1e-20)
            return acc

        f = jax.jit(chained)
        out = jax.block_until_ready(f(ro, rd))
        t0 = time.perf_counter()
        for _ in range(3):
            out = f(ro, rd)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / 3 / L * 1e3
        nt = ro.shape[0] // lanes
        print(f"LANES={lanes:5d}  query {dt:7.2f} ms  ({dt*1e3/nt:5.2f} us/step, {nt} steps)")


if __name__ == "__main__":
    main()
