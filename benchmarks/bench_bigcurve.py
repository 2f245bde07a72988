"""Big-scene scaling curve: bob x4 / x8 / x16 (42.7k / 85k / 171k triangles)
through the HBM-streaming kernel + super-chunk-gated exact mask.

The reference's ambition is 10M triangles (Parellel/main.cu:49 num_max); this
captures how the chunk-sweep accel degrades as the triangle count grows past
the VMEM-resident limit: perfect sub-linearity would keep Mrays/s flat.
Run: python benchmarks/bench_bigcurve.py (TPU). Env: RT_BIG_COPIES
(comma list, default 4,8,16), RT_BENCH_WIDTH/HEIGHT/REPEATS, RT_SUPER=0 to
disable the super-chunk path (A/B).
"""
from __future__ import annotations

import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax.numpy as jnp

import bench
from realtrace_tpu.apps import scenes
from realtrace_tpu.core.types import RenderConfig
from realtrace_tpu.ops import accel
from realtrace_tpu.ops.pallas import trace as ptrace


def main():
    w = int(os.environ.get("RT_BENCH_WIDTH", 1920))
    h = int(os.environ.get("RT_BENCH_HEIGHT", 1080))
    reps = int(os.environ.get("RT_BENCH_REPEATS", 4))
    copies = [int(c) for c in
              os.environ.get("RT_BIG_COPIES", "4,8,16").split(",")]
    if os.environ.get("RT_SUPER", "1") == "0":   # A/B: round-4 behavior
        ptrace.EXACT_MASK_MIN_TRIS = 1 << 30
    elif os.environ.get("RT_SUPER") == "force":  # A/B: engage at any count
        ptrace.EXACT_MASK_MIN_TRIS = 1

    chunk = int(os.environ.get("RT_BENCH_CHUNK", 64))
    cfg = RenderConfig(max_depth=2, accel="pallas", chunk_size=chunk)
    for n in copies:
        scene, cam = scenes.duplicated_serial_scene(
            n, texture_path="/root/reference/Serial/bob_diffuse.png")
        scene = accel.with_chunks(scene, cfg)
        pack = ptrace.build_pack(scene, cfg)
        camera = scenes.make_camera(cam, w, h, dtype=jnp.float32)
        fb = bench.FrameBench(scene, cfg)
        dt, nrays, acc = fb.measure(camera, f"big:x{n}", reps)
        mrays = nrays / dt / 1e6
        print(json.dumps({
            "metric": f"forward Mrays/s/chip {w}x{h} bob_x{n} "
                      f"{scene.n_triangles} tris depth-2 (streaming="
                      f"{not pack.resident}, super="
                      f"{scene.n_triangles >= ptrace.EXACT_MASK_MIN_TRIS})",
            "value": round(mrays, 3), "unit": "Mrays/s",
            "vs_baseline": round(mrays / bench.BASELINE_MRAYS, 4),
            "frame_ms": round(dt * 1e3, 2), "chunks": int(pack.lo.shape[0]),
            "checksum": round(acc, 5),
        }), flush=True)


if __name__ == "__main__":
    main()
