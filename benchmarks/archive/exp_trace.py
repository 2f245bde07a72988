"""Throwaway experiment: op-level profile of the real frame via jax.profiler.

Captures an xplane trace of steady-state frames and converts it with
tensorboard_plugin_profile to find where the milliseconds actually go.
"""
from __future__ import annotations

import glob
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp


def main():
    from realtrace_tpu.apps import scenes
    from realtrace_tpu.core.types import RenderConfig
    from realtrace_tpu.ops import accel
    from realtrace_tpu.render.pipeline import render_with_stats

    cfg = RenderConfig(max_depth=3, accel="pallas", chunk_size=64)
    scene, cam = scenes.serial_obj_scene(
        texture_path="/root/reference/Serial/bob_diffuse.png", dtype=jnp.float32)
    scene = accel.with_chunks(scene, cfg)
    camera = scenes.make_camera(cam, 1920, 1080, dtype=jnp.float32)

    f = jax.jit(lambda s, c: render_with_stats(s, c, cfg, branching=False))
    img, n = f(scene, camera)
    jax.block_until_ready(img)

    jax.profiler.start_trace("/tmp/rtprof")
    for _ in range(3):
        img, n = f(scene, camera)
    jax.block_until_ready(img)
    jax.profiler.stop_trace()

    paths = sorted(glob.glob("/tmp/rtprof/plugins/profile/*/*.xplane.pb"))
    print("xplanes:", paths)
    if not paths:
        return
    from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd
    for tool in ("op_profile", "hlo_stats", "framework_op_stats"):
        try:
            data, ctype = rtd.xspace_to_tool_data([paths[-1]], tool, {})
            out = f"/tmp/rtprof_{tool}.json"
            mode = "wb" if isinstance(data, bytes) else "w"
            with open(out, mode) as fh:
                fh.write(data)
            print(f"{tool}: wrote {out} ({ctype})")
        except Exception as e:
            print(f"{tool}: FAILED {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
