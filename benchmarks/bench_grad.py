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

    import functools

    import jax.tree_util as jtu
    from jax import lax

    def loss_of(p):
        return render_loss(p, scene, camera, cfg, target, False)

    def grad_scalar(p):
        loss, grads = jax.value_and_grad(loss_of)(p)
        return loss + sum(jnp.sum(g) * 1e-12 for g in jtu.tree_leaves(grads))

    def timed(fn):
        """Steady-state seconds/call: n perturbed calls inside ONE jitted
        fori_loop (the remote-TPU tunnel adds per-dispatch latency and can
        serve identical executions from a cache), dispatch cancelled by a
        single-call run, min of two attempts (intermittent tunnel stalls)."""
        @functools.partial(jax.jit, static_argnames=("n",))
        def loop(params, n: int):
            def body(i, acc):
                p = jtu.tree_map(
                    lambda x: x + jnp.asarray(i, x.dtype) * 1e-12, params)
                return acc + fn(p)
            return lax.fori_loop(0, n, body, jnp.zeros(()))

        jax.block_until_ready(loop(params, 1))            # compile both sizes
        jax.block_until_ready(loop(params, repeats + 1))
        dt1 = dt0 = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            jax.block_until_ready(loop(params, repeats + 1))
            dt1 = min(dt1, time.perf_counter() - t0)
        for _ in range(2):
            t0 = time.perf_counter()
            jax.block_until_ready(loop(params, 1))
            dt0 = min(dt0, time.perf_counter() - t0)
        return max(dt1 - dt0, 1e-9) / repeats

    t_fwd = timed(loss_of)
    t_bwd = timed(grad_scalar)

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
