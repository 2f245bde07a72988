"""Branching (dielectric) wavefront benchmark: bob + a glass sphere.

The flat 2W-wide compacted (reflect ‖ refract) wavefront (render/shade
_branch_levels) is golden-tested but its TPU throughput was never captured.
Scene: the serial bob scene plus one large dielectric sphere in front of the
model (Fresnel split every hit -> both children live), 1080p depth-3,
hardened FrameBench protocol. Run: python benchmarks/bench_branching.py (TPU).
Env: RT_BENCH_WIDTH/HEIGHT/DEPTH/REPEATS.
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

# scene construction lives in realtrace_tpu.apps.scenes.glass_bob_scene (it is
# also a default bench.py leg now); this script remains the standalone runner
glass_bob_scene = lambda: scenes.glass_bob_scene(
    texture_path="/root/reference/Serial/bob_diffuse.png")


def main():
    w = int(os.environ.get("RT_BENCH_WIDTH", 1920))
    h = int(os.environ.get("RT_BENCH_HEIGHT", 1080))
    depth = int(os.environ.get("RT_BENCH_DEPTH", 3))
    reps = int(os.environ.get("RT_BENCH_REPEATS", 5))

    cfg = RenderConfig(max_depth=depth, accel="pallas", chunk_size=32)
    scene, cam = glass_bob_scene()
    assert scene.has_dielectrics()
    scene = accel.with_chunks(scene, cfg)
    camera = scenes.make_camera(cam, w, h, dtype=jnp.float32)

    fb = bench.FrameBench(scene, cfg, branching=True)
    dt, nrays, acc = fb.measure(camera, "branching", reps)
    mrays = nrays / dt / 1e6
    print(json.dumps({
        "metric": f"forward Mrays/s/chip {w}x{h} bob + glass sphere "
                  f"depth-{depth} (branching dielectric wavefront)",
        "value": round(mrays, 3), "unit": "Mrays/s",
        "vs_baseline": round(mrays / bench.BASELINE_MRAYS, 4),
        "frame_ms": round(dt * 1e3, 2),
        "rays_per_frame_M": round(nrays / 1e6, 3),
    }), flush=True)


if __name__ == "__main__":
    main()
