"""Throwaway: bisect frame-time effect of reorder_secondary on TPU."""
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

    for reorder in (True, False):
        cfg = dataclasses.replace(base, reorder_secondary=reorder)
        f = jax.jit(lambda s, c: render_with_stats(s, c, cfg, branching=False))
        img, n = f(scene, camera)
        jax.block_until_ready(img)
        t0 = time.perf_counter()
        for _ in range(5):
            img, n = f(scene, camera)
        jax.block_until_ready(img)
        dt = (time.perf_counter() - t0) / 5 * 1e3
        print(f"reorder={int(reorder)}: {dt:7.1f} ms  rays {float(n)/1e6:.2f}M "
              f"-> {float(n)/dt/1e3:5.1f} Mrays/s")


if __name__ == "__main__":
    main()
