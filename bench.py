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

import functools
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
    repeats = int(os.environ.get("RT_BENCH_REPEATS", 1 if smoke else 10))
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

    from jax import lax

    @functools.partial(jax.jit, static_argnames=("n",))
    def frames(scene, camera, n: int):
        # n frames in ONE device program, each with a sub-micron camera
        # jitter: per-frame host dispatch through the remote-TPU tunnel
        # costs ~10-20ms AND identical executions have been observed to be
        # served from a cache — a fori_loop of distinct frames measures pure
        # steady-state device time
        def body(i, carry):
            acc, nr = carry
            cam_i = camera.replace(
                position=camera.position + i.astype(camera.position.dtype) * 1e-6)
            img, nrays = render_with_stats(scene, cam_i, cfg, branching=False)
            return acc + jnp.mean(img), nr + nrays
        return lax.fori_loop(0, n, body, (jnp.zeros(()), jnp.zeros(())))

    import sys

    def run(camera, tag):
        t0 = time.perf_counter()
        out = jax.block_until_ready(frames(scene, camera, 1))
        print(f"[bench:{tag}] compile+first frame: {time.perf_counter() - t0:.1f}s",
              file=sys.stderr, flush=True)
        # two timed attempts, take the min: the remote tunnel intermittently
        # stalls a dispatch for tens of seconds, which would otherwise land
        # in the measurement
        dt1 = dt0 = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            acc, nrays_tot = jax.block_until_ready(frames(scene, camera, repeats + 1))
            dt1 = min(dt1, time.perf_counter() - t0)   # repeats+1 frames
        for _ in range(2):
            t0 = time.perf_counter()
            jax.block_until_ready(frames(scene, camera, 1))
            dt0 = min(dt0, time.perf_counter() - t0)   # 1 frame (cancels dispatch)
        dt = max((dt1 - dt0) / repeats, 1e-9)
        nrays = float(nrays_tot) / (repeats + 1)
        print(f"[bench:{tag}] steady frame: {dt*1e3:.1f} ms, "
              f"rays/frame: {nrays/1e6:.2f}M, checksum {float(acc):.5f}",
              file=sys.stderr, flush=True)
        return nrays / dt / 1e6

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
