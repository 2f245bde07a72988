"""Round-4 experiment: TILE-granular deep-level re-compaction ladder.

At hit-heavy framings the level-0 compaction keeps ~all tiles (60% of pixels
hit), so bounce levels 1..D used to run full XLA shading at ~2M lanes even
though only RE-hits (a small fraction) stay live past level 1. deep_buckets
now gathers live TILES at level >= 2 into a smaller capacity (the level-0
machinery, applied recursively). Measures hit-heavy + headline 1080p for
deep_buckets in {0 (off), 2, 3}.
Run: python benchmarks/exp_deep_tiles.py (TPU).
"""
from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax.numpy as jnp

import bench
from realtrace_tpu.apps import scenes
from realtrace_tpu.core.types import RenderConfig
from realtrace_tpu.ops import accel


def main():
    w, h, depth, reps = 1920, 1080, 3, 5
    scene, cam = scenes.serial_obj_scene(
        texture_path="/root/reference/Serial/bob_diffuse.png", dtype=jnp.float32)
    cam_head = scenes.make_camera(cam, w, h, dtype=jnp.float32)
    cam_hh = scenes.make_camera(dict(cam, position=(0.0, 6.0, 14.0)), w, h,
                                dtype=jnp.float32)

    for db in (0, 2, 3):
        cfg = RenderConfig(max_depth=depth, accel="pallas", chunk_size=32,
                           deep_buckets=db)
        sc = accel.with_chunks(scene, cfg)
        fb = bench.FrameBench(sc, cfg)
        for tag, camera in (("hh", cam_hh), ("head", cam_head)):
            dt, nrays, acc = fb.measure(camera, f"db={db}:{tag}", reps)
            print(f"deep_buckets={db} {tag}: {dt*1e3:.1f} ms  "
                  f"{nrays/dt/1e6:.1f} Mrays/s  checksum {acc:.5f}", flush=True)


if __name__ == "__main__":
    main()
