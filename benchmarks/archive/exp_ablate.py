"""Throwaway experiment: decompose frame time by config ablation.

Times the REAL jitted frame (bob 1080p, pallas accel, compaction on) across
{depth 0/3} x {shadows on/off} to attribute per-level and shadow costs
without touching the code.
"""
from __future__ import annotations

import dataclasses
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp


def main():
    from realtrace_tpu.apps import scenes
    from realtrace_tpu.core.types import RenderConfig
    from realtrace_tpu.ops import accel
    from realtrace_tpu.render.pipeline import render_with_stats

    base = RenderConfig(max_depth=3, accel="pallas", chunk_size=64)
    scene, cam = scenes.serial_obj_scene(
        texture_path="/root/reference/Serial/bob_diffuse.png", dtype=jnp.float32)
    scene = accel.with_chunks(scene, base)
    camera = scenes.make_camera(cam, 1920, 1080, dtype=jnp.float32)

    for depth in (0, 1, 3):
        for shadows in (True, False):
            cfg = dataclasses.replace(base, max_depth=depth, shadows=shadows)
            f = jax.jit(lambda s, c: render_with_stats(s, c, cfg, branching=False))
            img, n = f(scene, camera)
            jax.block_until_ready(img)
            t0 = time.perf_counter()
            for _ in range(5):
                img, n = f(scene, camera)
            jax.block_until_ready(img)
            dt = (time.perf_counter() - t0) / 5 * 1e3
            print(f"depth={depth} shadows={int(shadows)}: {dt:7.1f} ms  "
                  f"rays {float(n)/1e6:5.2f}M  -> {float(n)/dt/1e3:6.1f} Mrays/s")


if __name__ == "__main__":
    main()
