"""Round-4 experiment: MXU precision for occlusion (any-mode) sweeps.

After the deep-tile compaction, the hit-heavy frame (115.3ms) is sweep-bound
again (54.5ms), with SHADOW sweeps ~34ms of that. The any-mode kernel's
matmul runs at HIGHEST (6-pass f32 emulation) like the closest kernel, but
occlusion emits only booleans — HIGH (3-pass, "f32-faithful") halves matmul
passes per visit. Legs:
  1. baseline (ANY_PRECISION=None -> highest everywhere)
  2. any-mode HIGH (closest stays highest)
  3. everything HIGH (cfg.matmul_precision="high") — selection drift check
Checksums printed: any drift vs leg-1 shows up immediately.
Run: python benchmarks/exp_any_precision.py (TPU).
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
from realtrace_tpu.ops.pallas import trace


def main():
    w, h, depth, reps = 1920, 1080, 3, 5
    scene, cam = scenes.serial_obj_scene(
        texture_path="/root/reference/Serial/bob_diffuse.png", dtype=jnp.float32)
    cam_head = scenes.make_camera(cam, w, h, dtype=jnp.float32)
    cam_hh = scenes.make_camera(dict(cam, position=(0.0, 6.0, 14.0)), w, h,
                                dtype=jnp.float32)

    legs = [("baseline", None, "highest"),
            ("any=high", "high", "highest"),
            ("all=high", None, "high")]
    for name, anyp, allp in legs:
        trace.ANY_PRECISION = anyp
        cfg = RenderConfig(max_depth=depth, accel="pallas", chunk_size=32,
                           matmul_precision=allp)
        sc = accel.with_chunks(scene, cfg)
        fb = bench.FrameBench(sc, cfg)
        for tag, camera in (("hh", cam_hh), ("head", cam_head)):
            dt, nrays, acc = fb.measure(camera, f"{name}:{tag}", reps)
            print(f"{name} {tag}: {dt*1e3:.1f} ms  {nrays/dt/1e6:.1f} Mrays/s"
                  f"  checksum {acc:.5f}", flush=True)
    trace.ANY_PRECISION = None


if __name__ == "__main__":
    main()
