"""Round-4 experiment: op-level profile of the HIT-HEAVY backward pass.

The round-4 capture put hit-heavy value_and_grad at 277.95 ms vs 108.07 ms
forward (2.57x). Candidate suspects: the shade-table gather's backward (a
2M-row scatter-add into the (N,25) table per level) and recompute-vs-residual
costs of the per-level checkpoint. Prints top HLO ops by self time.
Run: PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python \
    python benchmarks/exp_grad_profile.py (TPU).
"""
from __future__ import annotations

import collections
import glob
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp


def main():
    from realtrace_tpu.apps import scenes
    from realtrace_tpu.core.types import RenderConfig
    from realtrace_tpu.diff.inverse import render_loss, scene_params
    from realtrace_tpu.ops import accel

    cfg = RenderConfig(max_depth=3, accel="pallas", chunk_size=32)
    scene, cam = scenes.serial_obj_scene(
        texture_path="/root/reference/Serial/bob_diffuse.png", dtype=jnp.float32)
    scene = accel.with_chunks(scene, cfg)
    camera = scenes.make_camera(dict(cam, position=(0.0, 6.0, 14.0)),
                                1920, 1080, dtype=jnp.float32)
    target = jnp.zeros((1080 * 1920, 3), jnp.float32)
    params = scene_params(scene, ("tri_vertices", "tri_colors", "lights"))

    f = jax.jit(jax.value_and_grad(
        lambda p: render_loss(p, scene, camera, cfg, target, False)))
    loss, grads = f(params)
    jax.block_until_ready(loss)

    jax.profiler.start_trace("/tmp/rtgradprof")
    for _ in range(3):
        loss, grads = f(params)
    jax.block_until_ready(loss)
    jax.profiler.stop_trace()

    paths = sorted(glob.glob("/tmp/rtgradprof/plugins/profile/*/*.xplane.pb"))
    print("xplanes:", paths[-1:])
    if not paths:
        return
    from xprof.convert import raw_to_tool_data as rtd
    data, _ = rtd.xspace_to_tool_data([paths[-1]], "hlo_stats", {})
    d = json.loads(data)
    rows = [[c.get("v") for c in r["c"]] for r in d["rows"]]
    bycat = collections.Counter()
    for r in rows:
        bycat[r[2]] += r[9]
    print(f"TOTAL self: {sum(bycat.values())/3/1000:.1f} ms/step")
    for cat, us in bycat.most_common(12):
        print(f"{us/3/1000.0:9.2f} ms/step  {cat}")
    rows.sort(key=lambda r: -r[9])
    for r in rows[:30]:
        print(f"{r[9]/3/1000.0:8.2f} ms/step  x{r[6]:<4} {r[2]:<18} "
              f"{str(r[3])[:40]} | {str(r[4])[:80]}")


if __name__ == "__main__":
    main()
