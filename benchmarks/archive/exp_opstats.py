"""Throwaway experiment: capture a TPU profile of the bench frame and print
the top ops by self time (parsed from the xplane via tensorboard_plugin_profile).
"""
from __future__ import annotations

import glob
import os
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp


def main():
    from realtrace_tpu.apps import scenes
    from realtrace_tpu.core.types import RenderConfig
    from realtrace_tpu.ops import accel
    from realtrace_tpu.render.pipeline import render_with_stats

    depth = int(os.environ.get("RT_DEPTH", 3))
    cfg = RenderConfig(max_depth=depth, accel="pallas", chunk_size=64)
    scene, cam = scenes.serial_obj_scene(
        texture_path="/root/reference/Serial/bob_diffuse.png", dtype=jnp.float32)
    scene = accel.with_chunks(scene, cfg)
    camera = scenes.make_camera(cam, 1920, 1080, dtype=jnp.float32)

    f = jax.jit(lambda s, c: render_with_stats(s, c, cfg, branching=False))
    jax.block_until_ready(f(scene, camera))

    logdir = tempfile.mkdtemp(prefix="rtprof_")
    with jax.profiler.trace(logdir):
        for _ in range(3):
            out = f(scene, camera)
        jax.block_until_ready(out)

    # parse: find the xplane.pb and use the op_profile/tf-stats converter
    pbs = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"), recursive=True)
    print("xplane files:", pbs)
    from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd
    data, _ = rtd.xspace_to_tool_data(pbs, "framework_op_stats", {})
    import csv
    import io
    rows = list(csv.reader(io.StringIO(data.decode() if isinstance(data, bytes) else data)))
    hdr = rows[0]
    print(" | ".join(hdr[:10]))
    for r in rows[1:40]:
        print(" | ".join(r[:10]))


if __name__ == "__main__":
    main()
