"""Round-4 experiment: MXU precision for occlusion (any-mode) sweeps.

After the deep-tile compaction, the hit-heavy frame (115.3ms) is sweep-bound
again (54.5ms), with SHADOW sweeps ~34ms of that. The any-mode kernel's
matmul runs at HIGHEST (6-pass f32 emulation) like the closest kernel, but
occlusion emits only booleans — HIGH (3-pass, "f32-faithful") halves matmul
passes per visit. Legs:
  1. baseline (occlusion_precision="highest" everywhere)
  2. occlusion "default" (closest stays highest)
  3. everything "default" — selection drift check
Checksums + a flipped-pixel count quantify the drift.
Run: python benchmarks/exp_any_precision.py (TPU).
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
    w, h, depth, reps = 1920, 1080, 3, 5
    scene, cam = scenes.serial_obj_scene(
        texture_path="/root/reference/Serial/bob_diffuse.png", dtype=jnp.float32)
    cam_head = scenes.make_camera(cam, w, h, dtype=jnp.float32)
    cam_hh = scenes.make_camera(dict(cam, position=(0.0, 6.0, 14.0)), w, h,
                                dtype=jnp.float32)

    # NOTE: Mosaic supports only DEFAULT and HIGHEST dot precisions in-kernel
    # (HIGH raises NotImplementedError). DEFAULT = single-pass bf16.
    # RESULT (round 4): occlusion=default hh 108.4 / head 24.7 ms vs
    # baseline 115.5 / 27.2, flipping only 122-174 of 2.07M pixels at shadow
    # edges (counted below) -> adopted as the RenderConfig default.
    # all=default (bf16 CLOSEST selection) is far worse AND wrong: 399.4ms
    # hh with checksum drift 2.796 vs 2.749 — rejected, matmul_precision
    # stays "highest".
    legs = [("baseline", "highest", "highest"),
            ("occ=default", "default", "highest"),
            ("all=default", "default", "default")]
    for name, occp, allp in legs:
        cfg = RenderConfig(max_depth=depth, accel="pallas", chunk_size=32,
                           matmul_precision=allp, occlusion_precision=occp)
        sc = accel.with_chunks(scene, cfg)
        fb = bench.FrameBench(sc, cfg)
        for tag, camera in (("hh", cam_hh), ("head", cam_head)):
            dt, nrays, acc = fb.measure(camera, f"{name}:{tag}", reps)
            print(f"{name} {tag}: {dt*1e3:.1f} ms  {nrays/dt/1e6:.1f} Mrays/s"
                  f"  checksum {acc:.5f}", flush=True)

    # flipped-pixel count: occlusion=default vs highest, one frame each
    import jax
    import numpy as np
    from realtrace_tpu.render.pipeline import render_image
    imgs = {}
    for occp in ("highest", "default"):
        cfg = RenderConfig(max_depth=depth, accel="pallas", chunk_size=32,
                           occlusion_precision=occp)
        sc = accel.with_chunks(scene, cfg)
        f = jax.jit(lambda s, c: render_image(s, c, cfg, branching=False))
        imgs[occp] = np.asarray(f(sc, cam_hh))
    d = np.abs(imgs["highest"] - imgs["default"]).max(axis=-1)
    print(f"hh flipped pixels >1e-3: {(d > 1e-3).sum()} / {d.size} "
          f"({(d > 1e-3).mean()*100:.4f}%), max diff {d.max():.3f}", flush=True)


if __name__ == "__main__":
    main()
