"""Benchmark: forward Mrays/s per chip at 1080p on bob_tri.obj.

Prints JSON lines {"metric", "value", "unit", "vs_baseline"} — the
replacement for the reference's FPS title-bar counter
(Parellel/main.cu:79-85). Baseline target: 50 Mrays/s/chip (BASELINE.json
north star). Rays counted = every traced ray: primary + shadow + secondary
wavefront rays, as accumulated by the wavefront scan itself.

Two configs run: a HIT-HEAVY close framing (camera (0,6,14): ~60% of pixels
hit bob, so the number can't lean on cheap background lanes) printed first,
then the HEADLINE 1080p framing (reference camera (60,60,0)) printed LAST —
the driver metric.

Env knobs: RT_BENCH_WIDTH/HEIGHT/DEPTH/REPEATS, RT_BENCH_ACCEL
(chunked|bruteforce|pallas), RT_BENCH_SMOKE=1 for a tiny CPU smoke run,
RT_BENCH_HITHEAVY=0 to skip the secondary config.
"""
from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp


def main() -> None:
    smoke = os.environ.get("RT_BENCH_SMOKE") == "1"
    if smoke:
        jax.config.update("jax_platforms", "cpu")
    width = int(os.environ.get("RT_BENCH_WIDTH", 64 if smoke else 1920))
    height = int(os.environ.get("RT_BENCH_HEIGHT", 48 if smoke else 1080))
    depth = int(os.environ.get("RT_BENCH_DEPTH", 3))
    repeats = int(os.environ.get("RT_BENCH_REPEATS", 1 if smoke else 5))
    accel_mode = os.environ.get("RT_BENCH_ACCEL", "pallas")

    from realtrace_tpu.apps import scenes
    from realtrace_tpu.core.types import RenderConfig
    from realtrace_tpu.ops import accel
    from realtrace_tpu.render.pipeline import render_with_stats

    cfg = RenderConfig(max_depth=depth, accel=accel_mode,
                       chunk_size=int(os.environ.get("RT_BENCH_CHUNK", 64)),
                       shortlist=48, ray_block=int(os.environ.get("RT_BENCH_BLOCK", 8192)),
                       reorder_secondary=os.environ.get("RT_BENCH_REORDER", "0") == "1")
    scene, cam = scenes.serial_obj_scene(
        texture_path="/root/reference/Serial/bob_diffuse.png", dtype=jnp.float32)
    if accel_mode != "bruteforce":
        scene = accel.with_chunks(scene, cfg)
    camera = scenes.make_camera(cam, width, height, dtype=jnp.float32)

    @jax.jit
    def frame(scene, camera):
        return render_with_stats(scene, camera, cfg, branching=False)

    import sys

    def run(camera, tag):
        t0 = time.perf_counter()
        img, nrays = frame(scene, camera)       # compile + warm-up
        jax.block_until_ready(img)
        print(f"[bench:{tag}] compile+first frame: {time.perf_counter() - t0:.1f}s",
              file=sys.stderr, flush=True)
        t0 = time.perf_counter()
        for _ in range(repeats):
            img, nrays = frame(scene, camera)
        jax.block_until_ready(img)
        dt = (time.perf_counter() - t0) / repeats
        print(f"[bench:{tag}] steady frame: {dt*1e3:.1f} ms, "
              f"rays/frame: {float(nrays)/1e6:.2f}M", file=sys.stderr, flush=True)
        return float(nrays) / dt / 1e6

    # secondary: hit-heavy close framing (~60% of pixels hit bob) — reported
    # FIRST so the headline metric stays the last JSON line for the driver
    if os.environ.get("RT_BENCH_HITHEAVY", "1") == "1" and not smoke:
        cam_close = dict(cam, position=(0.0, 6.0, 14.0))
        camera_close = scenes.make_camera(cam_close, width, height, dtype=jnp.float32)
        mrays_hh = run(camera_close, "hit-heavy")
        print(json.dumps({
            "metric": f"forward Mrays/s/chip {width}x{height} bob close-framed "
                      f"(~60% hit) depth-{depth} ({accel_mode})",
            "value": round(mrays_hh, 3),
            "unit": "Mrays/s",
            "vs_baseline": round(mrays_hh / 50.0, 4),
        }), flush=True)

    mrays = run(camera, "headline")
    print(json.dumps({
        "metric": f"forward Mrays/s/chip {width}x{height} bob_tri.obj depth-{depth} ({accel_mode})",
        "value": round(mrays, 3),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / 50.0, 4),
    }))


if __name__ == "__main__":
    main()
