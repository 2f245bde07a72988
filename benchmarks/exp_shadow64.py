"""Round-4 experiment: separate chunk size for occlusion (any-mode) sweeps.

The hit-heavy profile puts 38.4 of 62.9 sweep-ms in SHADOW sweeps (L0 16.2 +
3 levels x 7.4): shadow rays cross the whole model toward the light, so those
sweeps are visit-count-bound, and their division-free OR-reduce epilogue is
cheap. Hypothesis: any-mode sweeps at chunk 64 (cfg.shadow_chunk_size) halve
visits and per-visit loop overhead at equal triangle-test FLOPs, while the
closest sweeps keep chunk 32 (where min/argmin epilogue cost dominates).

Measures hit-heavy + headline 1080p for any-mode chunk sizes {0, 64, 128}.

RESULT (round 4): a LOSER on every framing — hit-heavy 171.3/194.4 ms
(64/128) vs 159.0 baseline; headline 29.2/31.7 vs 26.6. Coarser chunks test
~2x/4x the triangles per listed visit and the lists don't shrink enough.
The cfg knob was removed; this script drives the remaining pack.any_pack
hook directly. Run: python benchmarks/exp_shadow64.py (TPU).
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
from realtrace_tpu.ops.pallas import trace as ptrace

_ORIG_BUILD = ptrace.build_pack


def main():
    w, h, depth, reps = 1920, 1080, 3, 5
    scene, cam = scenes.serial_obj_scene(
        texture_path="/root/reference/Serial/bob_diffuse.png", dtype=jnp.float32)
    cam_head = scenes.make_camera(cam, w, h, dtype=jnp.float32)
    cam_hh = scenes.make_camera(dict(cam, position=(0.0, 6.0, 14.0)), w, h,
                                dtype=jnp.float32)

    for c2 in (0, 64, 128):
        def build(scene_, cfg_, c2=c2):
            pack = _ORIG_BUILD(scene_, cfg_)
            if c2:
                pack.any_pack = ptrace._pack_for(
                    scene_.tri_chunk_perm, scene_.tri_vertices, c2)
            return pack

        ptrace.build_pack = build
        cfg = RenderConfig(max_depth=depth, accel="pallas", chunk_size=32)
        sc = accel.with_chunks(scene, cfg)
        fb = bench.FrameBench(sc, cfg)
        for tag, camera in (("hh", cam_hh), ("head", cam_head)):
            dt, nrays, acc = fb.measure(camera, f"c2={c2}:{tag}", reps)
            print(f"shadow_chunk={c2} {tag}: {dt*1e3:.1f} ms  "
                  f"{nrays/dt/1e6:.1f} Mrays/s  checksum {acc:.5f}", flush=True)
    ptrace.build_pack = _ORIG_BUILD


if __name__ == "__main__":
    main()
