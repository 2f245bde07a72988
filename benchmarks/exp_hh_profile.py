"""Round-3 experiment: op-level profile of the HIT-HEAVY 1080p frame.

Captures an xplane trace of steady-state close-framed frames and converts it
with tensorboard_plugin_profile; prints the top HLO ops by self time so the
hit-heavy optimization targets the real costs (mask vs sweep vs sort vs
shading). Run: PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python \
    python benchmarks/exp_hh_profile.py
Env: RT_HH_EXACT=0|1 (config under test).
"""
from __future__ import annotations

import glob
import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp


def main():
    from realtrace_tpu.apps import scenes
    from realtrace_tpu.core.types import RenderConfig
    from realtrace_tpu.ops import accel
    from realtrace_tpu.render.pipeline import render_with_stats

    cfg = RenderConfig(
        max_depth=3, accel="pallas", chunk_size=32,
        exact_mask_secondary=os.environ.get("RT_HH_EXACT", "0") == "1")
    scene, cam = scenes.serial_obj_scene(
        texture_path="/root/reference/Serial/bob_diffuse.png", dtype=jnp.float32)
    scene = accel.with_chunks(scene, cfg)
    camera = scenes.make_camera(dict(cam, position=(0.0, 6.0, 14.0)),
                                1920, 1080, dtype=jnp.float32)

    f = jax.jit(lambda s, c: render_with_stats(s, c, cfg, branching=False))
    img, n = f(scene, camera)
    jax.block_until_ready(img)

    jax.profiler.start_trace("/tmp/rthhprof")
    for _ in range(3):
        img, n = f(scene, camera)
    jax.block_until_ready(img)
    jax.profiler.stop_trace()

    paths = sorted(glob.glob("/tmp/rthhprof/plugins/profile/*/*.xplane.pb"))
    print("xplanes:", paths)
    if not paths:
        return
    from xprof.convert import raw_to_tool_data as rtd
    data, _ = rtd.xspace_to_tool_data([paths[-1]], "hlo_stats", {})
    out = "/tmp/rthh_hlo_stats.json"
    mode = "wb" if isinstance(data, bytes) else "w"
    with open(out, mode) as fh:
        fh.write(data)
    print("wrote", out)
    # gviz table format: {"cols": [...], "rows": [{"c": [{"v": ...}, ...]}]}
    # columns (xprof hlo_stats): 2=HLO category, 3=HLO op name,
    # 6=occurrences, 9=total self time (us)
    d = json.loads(data)
    rows = [[c.get("v") for c in r["c"]] for r in d["rows"]]
    import collections
    bycat = collections.Counter()
    for r in rows:
        bycat[r[2]] += r[9]
    print(f"TOTAL self: {sum(bycat.values())/3/1000:.1f} ms/frame")
    for cat, us in bycat.most_common(10):
        print(f"{us/3/1000.0:9.2f} ms/frame  {cat}")
    rows.sort(key=lambda r: -r[9])
    for r in rows[:30]:
        print(f"{r[9]/3/1000.0:8.2f} ms/frame  x{r[6]:<4} {r[2]:<20} {str(r[3])[:60]}")


if __name__ == "__main__":
    main()
