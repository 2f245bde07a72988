"""Benchmark: forward Mrays/s per chip at 1080p on bob_tri.obj.

Prints JSON lines {"metric", "value", "unit", "vs_baseline"} — the
replacement for the reference's FPS title-bar counter
(Parellel/main.cu:79-85). Baseline target: 50 Mrays/s/chip (BASELINE.json
north star). Rays counted = every traced ray: primary + shadow + secondary
wavefront rays, as accumulated by the wavefront scan itself.

The headline config is the reference framing (camera (60,60,0), 1080p).
RT_BENCH_HITHEAVY=1 additionally runs a HIT-HEAVY close framing (camera
(0,6,14): ~60% of pixels hit bob, so the number can't lean on cheap
background lanes) BEFORE the headline — kept opt-in (see
benchmarks/bench_hitheavy.py) because its ~10x slower frames raise the odds
of a remote-tunnel stall starving the headline metric.

Env knobs: RT_BENCH_WIDTH/HEIGHT/DEPTH/REPEATS, RT_BENCH_ACCEL
(chunked|bruteforce|pallas), RT_BENCH_SMOKE=1 for a tiny CPU smoke run.
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
                       chunk_size=int(os.environ.get("RT_BENCH_CHUNK", 32)),
                       shortlist=48, ray_block=int(os.environ.get("RT_BENCH_BLOCK", 8192)),
                       reorder_secondary=os.environ.get("RT_BENCH_REORDER", "0") == "1")
    scene, cam = scenes.serial_obj_scene(
        texture_path="/root/reference/Serial/bob_diffuse.png", dtype=jnp.float32)
    if accel_mode != "bruteforce":
        scene = accel.with_chunks(scene, cfg)
    camera = scenes.make_camera(cam, width, height, dtype=jnp.float32)

    from jax import lax

    @functools.partial(jax.jit, static_argnames=("n",))
    def frames(scene, camera, off, n: int):
        # n frames in ONE device program, each with a sub-micron camera
        # jitter: per-frame host dispatch through the remote-TPU tunnel
        # costs ~10-20ms AND identical executions (same program AND inputs)
        # are served from a cache — so frames vary within the loop AND every
        # call passes a fresh ``off``. This measures pure steady-state device
        # time.
        def body(i, carry):
            acc, nr = carry
            cam_i = camera.replace(
                position=camera.position
                + (off + i.astype(camera.position.dtype)) * 1e-6)
            img, nrays = render_with_stats(scene, cam_i, cfg, branching=False)
            return acc + jnp.mean(img), nr + nrays
        return lax.fori_loop(0, n, body, (jnp.zeros(()), jnp.zeros(())))

    import sys

    def run(camera, tag, reps=None):
        reps = repeats if reps is None else reps
        seq = iter(range(1, 1000))

        def go(n):
            # fresh offset per call (no two executions see identical inputs);
            # the scalar float() read is the ONLY reliable completion fence —
            # block_until_ready has been observed to return early through the
            # remote tunnel
            acc, nr = frames(scene, camera, jnp.float32(next(seq) * 100.0), n)
            return float(acc), float(nr)

        t0 = time.perf_counter()
        go(1)
        print(f"[bench:{tag}] compile+first frame: {time.perf_counter() - t0:.1f}s",
              file=sys.stderr, flush=True)
        go(reps + 1)      # compile the timed size outside the timing
        # two timed attempts, take the min: the remote tunnel intermittently
        # stalls a dispatch for tens of seconds, which would otherwise land
        # in the measurement
        dt1 = dt0 = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            acc, nrays_tot = go(reps + 1)
            dt1 = min(dt1, time.perf_counter() - t0)   # repeats+1 frames
        for _ in range(2):
            t0 = time.perf_counter()
            go(1)
            dt0 = min(dt0, time.perf_counter() - t0)   # 1 frame (cancels dispatch)
        dt = max((dt1 - dt0) / reps, 1e-9)
        nrays = nrays_tot / (reps + 1)
        print(f"[bench:{tag}] steady frame: {dt*1e3:.1f} ms, "
              f"rays/frame: {nrays/1e6:.2f}M, checksum {acc:.5f}",
              file=sys.stderr, flush=True)
        return nrays / dt / 1e6

    # secondary: hit-heavy close framing (~60% of pixels hit bob) — reported
    # FIRST so the headline metric stays the last JSON line for the driver
    if os.environ.get("RT_BENCH_HITHEAVY", "0") == "1" and not smoke:
        cam_close = dict(cam, position=(0.0, 6.0, 14.0))
        camera_close = scenes.make_camera(cam_close, width, height, dtype=jnp.float32)
        # hit-heavy frames are ~10x slower: fewer reps keep the run bounded
        mrays_hh = run(camera_close, "hit-heavy", reps=max(2, repeats // 3))
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
