"""Round-4 experiment: transposed shade-table gather layout A/B on TPU.

The round-4 profile showed the gathered (R, 25) shade table lays out
T(8,128) — minor dim padded to 128 lanes, ~5.1x logical bytes — and each of
the six material-column extract fusions re-reads ALL of it (1.43ms each, 3x
per frame, 10.9 GiB/s useful BW). ops.intersect.TRANS_GATHER transposes the
gather once to (25, R) (sublane-major, 1.28x padding) behind an
optimization_barrier; every downstream column access becomes a contiguous
row slice. (The narrow-table alternative, MAT_SPLIT, measured WORSE —
exp_mat_split.py — because any (R, k) array pays the same lane padding.)

Run: python benchmarks/exp_trans_gather.py (TPU).
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

    for trans in (False, True):
        intersect.TRANS_GATHER = trans
        fb = bench.FrameBench(scene, cfg)
        for tag, camera in (("hh", cam_hh), ("head", cam_head)):
            dt, nrays, acc = fb.measure(camera, f"trans={int(trans)}:{tag}", reps)
            print(f"TRANS_GATHER={trans} {tag}: {dt*1e3:.1f} ms  "
                  f"{nrays/dt/1e6:.1f} Mrays/s  checksum {acc:.5f}", flush=True)


if __name__ == "__main__":
    main()
