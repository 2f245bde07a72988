"""Round-3 ablation: headline (reference framing) frame time for the
{exact_mask_secondary} x {reorder_children} combos, hardened protocol.
Run: python benchmarks/exp_head_ablate.py
"""
from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax.numpy as jnp

import bench
from realtrace_tpu.apps import scenes
from realtrace_tpu.core.types import RenderConfig
from realtrace_tpu.ops import accel


def main():
    w, h, depth, reps = 1920, 1080, 3, 10
    base = dict(max_depth=depth, accel="pallas", chunk_size=32)
    scene, cam = scenes.serial_obj_scene(
        texture_path="/root/reference/Serial/bob_diffuse.png", dtype=jnp.float32)
    camera = scenes.make_camera(cam, w, h, dtype=jnp.float32)

    for exact, reorder in ((False, False), (True, False), (True, True)):
        cfg = RenderConfig(**base, exact_mask_secondary=exact,
                           reorder_children=reorder)
        sc = accel.with_chunks(scene, cfg)
        tag = f"exact={int(exact)},reorder={int(reorder)}"
        dt, nrays, _ = bench.FrameBench(sc, cfg).measure(camera, tag, reps)
        print(f"{tag}: {dt*1e3:.1f} ms  {nrays/dt/1e6:.1f} Mrays/s", flush=True)


if __name__ == "__main__":
    main()
