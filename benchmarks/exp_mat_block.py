"""Round-4 experiment: material columns via ONE barrier-pinned block slice.

The six per-level material extracts each re-read the fat row-major (R, 25)
gather output with strided accesses (4.29ms x6 x3/frame at hit-heavy 1080p).
ops.intersect.MAT_BLOCK_SLICE materializes g[:, 18:24] once behind an
optimization_barrier — XLA lays narrow non-gather (R, k) arrays column-major,
making the per-column extracts contiguous.

Run: python benchmarks/exp_mat_block.py (TPU).
"""
from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax.numpy as jnp

import bench
from realtrace_tpu.apps import scenes
from realtrace_tpu.core.types import RenderConfig
from realtrace_tpu.ops import accel, intersect


def main():
    w, h, depth, reps = 1920, 1080, 3, 5
    cfg = RenderConfig(max_depth=depth, accel="pallas", chunk_size=32)
    scene, cam = scenes.serial_obj_scene(
        texture_path="/root/reference/Serial/bob_diffuse.png", dtype=jnp.float32)
    scene = accel.with_chunks(scene, cfg)
    cam_head = scenes.make_camera(cam, w, h, dtype=jnp.float32)
    cam_hh = scenes.make_camera(dict(cam, position=(0.0, 6.0, 14.0)), w, h,
                                dtype=jnp.float32)

    for blk in (False, True):
        intersect.MAT_BLOCK_SLICE = blk
        fb = bench.FrameBench(scene, cfg)
        for tag, camera in (("hh", cam_hh), ("head", cam_head)):
            dt, nrays, acc = fb.measure(camera, f"blk={int(blk)}:{tag}", reps)
            print(f"MAT_BLOCK_SLICE={blk} {tag}: {dt*1e3:.1f} ms  "
                  f"{nrays/dt/1e6:.1f} Mrays/s  checksum {acc:.5f}", flush=True)


if __name__ == "__main__":
    main()
