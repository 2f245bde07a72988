"""Throwaway experiment: dump compiled HLO of the bench frame to identify the
hot fusions from the device trace (fusion.54/55/57, ~30ms combined)."""
from __future__ import annotations

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

    cfg = RenderConfig(max_depth=3, accel="pallas", chunk_size=64)
    scene, cam = scenes.serial_obj_scene(
        texture_path="/root/reference/Serial/bob_diffuse.png", dtype=jnp.float32)
    scene = accel.with_chunks(scene, cfg)
    camera = scenes.make_camera(cam, 1920, 1080, dtype=jnp.float32)

    f = jax.jit(lambda s, c: render_with_stats(s, c, cfg, branching=False))
    txt = f.lower(scene, camera).compile().as_text()
    with open("/tmp/frame_hlo.txt", "w") as fh:
        fh.write(txt)
    print("wrote /tmp/frame_hlo.txt,", len(txt) / 1e6, "MB")


if __name__ == "__main__":
    main()
