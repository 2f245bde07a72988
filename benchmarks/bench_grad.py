"""Secondary benchmark: backward/forward time ratio (BASELINE.json metric 2).

Times the forward render vs value_and_grad of the pixel loss on the same
scene/resolution. Prints one JSON line.

Env: RT_BENCH_WIDTH/HEIGHT/DEPTH, RT_BENCH_ACCEL, RT_BENCH_SMOKE=1.
"""
from __future__ import annotations

import json
import os
import time

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp


def main() -> None:
    smoke = os.environ.get("RT_BENCH_SMOKE") == "1"
    if smoke:
        jax.config.update("jax_platforms", "cpu")
    # defaults = the flagship config BENCH reports (1080p bob depth-3 pallas)
    width = int(os.environ.get("RT_BENCH_WIDTH", 64 if smoke else 1920))
    height = int(os.environ.get("RT_BENCH_HEIGHT", 48 if smoke else 1080))
    depth = int(os.environ.get("RT_BENCH_DEPTH", 3))
    accel_mode = os.environ.get("RT_BENCH_ACCEL", "chunked" if smoke else "pallas")
    repeats = 1 if smoke else 3

    from realtrace_tpu.apps import scenes
    from realtrace_tpu.core.types import RenderConfig
    from realtrace_tpu.diff.inverse import render_loss, scene_params
    from realtrace_tpu.ops import accel
    from realtrace_tpu.render.pipeline import render_buffer

    cfg = RenderConfig(max_depth=depth, accel=accel_mode)
    scene, cam = scenes.serial_obj_scene(
        texture_path=None if smoke else "/root/reference/Serial/bob_diffuse.png",
        dtype=jnp.float32)
    if accel_mode != "bruteforce":
        scene = accel.with_chunks(scene, cfg)
    camera = scenes.make_camera(cam, width, height, dtype=jnp.float32)
    target = jnp.zeros((height * width, 3), jnp.float32)
    params = scene_params(scene, ("tri_vertices", "tri_colors", "lights"))

    fwd = jax.jit(lambda p: render_loss(p, scene, camera, cfg, target, False))
    bwd = jax.jit(jax.value_and_grad(
        lambda p: render_loss(p, scene, camera, cfg, target, False)))

    jax.block_until_ready(fwd(params))
    jax.block_until_ready(bwd(params))

    t0 = time.perf_counter()
    for _ in range(repeats):
        out = fwd(params)
    jax.block_until_ready(out)
    t_fwd = (time.perf_counter() - t0) / repeats

    t0 = time.perf_counter()
    for _ in range(repeats):
        out = bwd(params)
    jax.block_until_ready(out)
    t_bwd = (time.perf_counter() - t0) / repeats

    ratio = t_bwd / t_fwd
    print(json.dumps({
        "metric": f"backward/forward time ratio {width}x{height} bob depth-{depth} ({accel_mode})",
        "value": round(ratio, 3),
        "unit": "x",
        "forward_s": round(t_fwd, 4),
        "backward_s": round(t_bwd, 4),
    }))


if __name__ == "__main__":
    main()
