"""Big-scene benchmark: the HBM-streaming sweep path on >25k-triangle scenes.

Scenes over RESIDENT_LIMIT can't keep the triangle-constants table VMEM-
resident; they stream per-chunk slices with double-buffered DMA
(ops/pallas/trace._kernel_stream). This bench:

  1. bob x2 (21,376 tris, table ~5.5MB): runs BOTH variants — resident
     (default) and streaming (forced by shrinking RESIDENT_LIMIT) — the
     apples-to-apples overhead check (target: streaming within ~1.5x).
     (This leg also runs inside plain `python bench.py` — bench_stream_ratio.)
  2. bob x4 (42,752 tris, ~10.9MB): streaming only (over the limit), the
     actual big-scene configuration.

Timing uses bench.py's hardened protocol (jittered fori_loop, dispatch
cancellation, min-of-attempts with agreement retry) — repeated identical
dispatches are untrustworthy through the remote-TPU tunnel (CLAUDE.md).

Usage: python benchmarks/bench_bigscene.py (TPU).
Env: RT_BENCH_WIDTH/HEIGHT/DEPTH/REPEATS.
"""
from __future__ import annotations

import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax.numpy as jnp


def bench(scene, cam, cfg, label: str, repeats: int, width: int, height: int):
    from bench import FrameBench
    from realtrace_tpu.apps import scenes

    camera = scenes.make_camera(cam, width, height, dtype=jnp.float32)
    dt, nrays, _ = FrameBench(scene, cfg).measure(camera, label, repeats)
    mrays = nrays / dt / 1e6
    print(json.dumps({
        "metric": f"forward Mrays/s/chip {width}x{height} {label}",
        "value": round(mrays, 3), "unit": "Mrays/s",
        "frame_ms": round(dt * 1e3, 2),
        "rays_per_frame_M": round(nrays / 1e6, 3),
    }), flush=True)
    return mrays


def main() -> None:
    width = int(os.environ.get("RT_BENCH_WIDTH", 1920))
    height = int(os.environ.get("RT_BENCH_HEIGHT", 1080))
    depth = int(os.environ.get("RT_BENCH_DEPTH", 2))
    repeats = int(os.environ.get("RT_BENCH_REPEATS", 3))

    from realtrace_tpu.apps import scenes
    from realtrace_tpu.core.types import RenderConfig
    from realtrace_tpu.ops import accel
    from realtrace_tpu.ops.pallas import trace as ptrace

    cfg = RenderConfig(max_depth=depth, accel="pallas", chunk_size=64)

    # ---- bob x2: resident vs forced-streaming on the SAME scene ----------
    scene2, cam = scenes.duplicated_serial_scene(
        2, texture_path="/root/reference/Serial/bob_diffuse.png")
    scene2 = accel.with_chunks(scene2, cfg)
    m_res = bench(scene2, cam, cfg, "bob_x2 21k tris (resident)",
                  repeats, width, height)
    saved = ptrace.RESIDENT_LIMIT
    ptrace.RESIDENT_LIMIT = 0          # force the streaming variant
    try:
        m_str = bench(scene2, cam, cfg, "bob_x2 21k tris (streaming forced)",
                      repeats, width, height)
    finally:
        ptrace.RESIDENT_LIMIT = saved
    print(json.dumps({
        "metric": "streaming/resident frame-time ratio bob_x2",
        "value": round(m_res / m_str, 3), "unit": "x (target <= 1.5)",
    }), flush=True)

    # ---- bob x4: over the VMEM limit -> streaming by construction --------
    scene4, cam = scenes.duplicated_serial_scene(
        4, texture_path="/root/reference/Serial/bob_diffuse.png")
    scene4 = accel.with_chunks(scene4, cfg)
    pack = ptrace.build_pack(scene4, cfg)
    assert not pack.resident, "expected the over-limit scene to stream"
    bench(scene4, cam, cfg, "bob_x4 43k tris (streaming)", repeats, width, height)


if __name__ == "__main__":
    main()
