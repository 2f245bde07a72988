"""Round-4 experiment: material-scalar shade-table split A/B on TPU.

The round-3 hit-heavy profile charged ~26ms/frame to six material-column
extract fusions re-streaming the (R, 25) gathered shade table, plus ~17ms to
the gather+copy itself. Hypothesis: gathering the 6 material scalars from a
SEPARATE narrow (N, 6) table makes each extract relayout a (R, 6) array
instead (6x smaller), at identical total gather bytes.

Measures the hit-heavy AND headline 1080p frames for both settings of
ops.intersect.MAT_SPLIT with the hardened FrameBench protocol.
Run: python benchmarks/exp_mat_split.py (TPU).
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

    for split in (False, True):
        intersect.MAT_SPLIT = split
        fb = bench.FrameBench(scene, cfg)
        for tag, camera in (("head", cam_head), ("hh", cam_hh)):
            dt, nrays, acc = fb.measure(camera, f"split={int(split)}:{tag}", reps)
            print(f"MAT_SPLIT={split} {tag}: {dt*1e3:.1f} ms  "
                  f"{nrays/dt/1e6:.1f} Mrays/s  checksum {acc:.5f}", flush=True)


if __name__ == "__main__":
    main()
