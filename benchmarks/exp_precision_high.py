"""Round-3 experiment: is matmul precision HIGH (3-pass bf16) hit-exact?

Round 2 measured DEFAULT (1-pass bf16) flipping 164/2M hits and kept
HIGHEST (6-pass, f32-true). HIGH was never tested. This runs the closest
and any-mode queries over the REAL primary + shadow wavefronts of both
bench framings at HIGHEST vs HIGH, compares (t, idx, occlusion) bitwise,
and times the frame at each setting. Run on TPU.

RESULT (round 3): DEAD END — Mosaic rejects HIGH ("Unsupported dot
precision: HIGH" from the pallas lowering); only DEFAULT and HIGHEST
exist inside the kernel, and DEFAULT flips hits (round 2). HIGHEST stays.
"""
from __future__ import annotations

import dataclasses
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

import bench
from realtrace_tpu.apps import scenes
from realtrace_tpu.core.types import RenderConfig
from realtrace_tpu.ops import accel
from realtrace_tpu.ops.pallas import trace as pt
from realtrace_tpu.render.shade import closest_query, hit_attributes, _shadow_targets


def main():
    w, h = 1920, 1080
    cfg = RenderConfig(max_depth=3, accel="pallas", chunk_size=32)
    scene, cam = scenes.serial_obj_scene(
        texture_path="/root/reference/Serial/bob_diffuse.png", dtype=jnp.float32)
    scene = accel.with_chunks(scene, cfg)
    pack = pt.build_pack(scene, cfg)

    for camname, pos in (("headline", None), ("hit-heavy", (0.0, 6.0, 14.0))):
        cam_d = dict(cam) if pos is None else dict(cam, position=pos)
        camera = scenes.make_camera(cam_d, w, h, dtype=jnp.float32)
        rd = camera.ray_directions()
        ro = jnp.broadcast_to(camera.position, rd.shape)

        res = {}
        for prec in ("highest", "high"):
            c = dataclasses.replace(cfg, matmul_precision=prec)
            t, idx = pt.closest_triangle(scene, ro, rd, c, pack=pack, raw_idx=True)
            hit = hit_attributes(scene, ro, rd, t,
                                 jnp.where(idx >= 0, 1, 0), jnp.maximum(idx, 0),
                                 cfg, pack=pack)
            sh_o, sh_d = _shadow_targets(scene, hit.position,
                                         idx >= 0, cfg)[0]
            occ = pt.any_triangle(scene, sh_o, sh_d, c, pack=pack)
            res[prec] = (np.asarray(t), np.asarray(idx), np.asarray(occ))
        t0, i0, o0 = res["highest"]
        t1, i1, o1 = res["high"]
        nh = int((i0 >= 0).sum())
        print(f"[{camname}] hits {nh}/{t0.size}: "
              f"idx mismatches {int((i0 != i1).sum())}, "
              f"t mismatches {int((t0 != t1).sum())} "
              f"(max |dt| on common hits "
              f"{float(np.abs(np.where((i0>=0)&(i1>=0), t0-t1, 0)).max()):.3e}), "
              f"occlusion flips {int((o0 != o1).sum())}", flush=True)

    # frame timing at each precision (hardened protocol)
    camera = scenes.make_camera(dict(cam, position=(0.0, 6.0, 14.0)), w, h,
                                dtype=jnp.float32)
    for prec in ("highest", "high"):
        c = dataclasses.replace(cfg, matmul_precision=prec)
        dt, nrays, _ = bench.FrameBench(scene, c).measure(camera, f"prec:{prec}", 5)
        print(f"hit-heavy @ {prec}: {dt*1e3:.1f} ms  {nrays/dt/1e6:.1f} Mrays/s",
              flush=True)


if __name__ == "__main__":
    main()
