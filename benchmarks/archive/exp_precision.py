"""Throwaway experiment: MXU precision for the sweep's triangle test.

HIGHEST (6-pass f32 emulation) is the current default; HIGH (3-pass bf16x3)
would halve matmul time IF the chunk-recentered conditioning keeps hit
classification intact. Renders bob at 512x512 depth-2 on TPU with each
precision and reports pixel deltas vs HIGHEST and vs the XLA chunked path
(whose triangle test is plain f32 arithmetic).
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


def main():
    from realtrace_tpu.apps import scenes
    from realtrace_tpu.core.types import RenderConfig
    from realtrace_tpu.ops import accel
    from realtrace_tpu.render.pipeline import render_image

    cfg0 = RenderConfig(max_depth=2, accel="pallas", chunk_size=64)
    scene, cam = scenes.serial_obj_scene(
        texture_path="/root/reference/Serial/bob_diffuse.png", dtype=jnp.float32)
    scene = accel.with_chunks(scene, cfg0)
    camera = scenes.make_camera(cam, 512, 512, dtype=jnp.float32)

    imgs = {}
    for prec in ("highest", "default"):   # HIGH: unsupported by Mosaic dot lowering
        cfg = dataclasses.replace(cfg0, matmul_precision=prec)
        f = jax.jit(lambda s, c: render_image(s, c, cfg, branching=False))
        img = jax.block_until_ready(f(scene, camera))
        t0 = time.perf_counter()
        for _ in range(3):
            img = f(scene, camera)
        jax.block_until_ready(img)
        print(f"{prec:8s}: {(time.perf_counter()-t0)/3*1e3:7.1f} ms/frame")
        imgs[prec] = np.asarray(img)

    cfg_x = dataclasses.replace(cfg0, accel="chunked", shortlist=64)
    fx = jax.jit(lambda s, c: render_image(s, c, cfg_x, branching=False))
    imgs["xla_chunked"] = np.asarray(jax.block_until_ready(fx(scene, camera)))

    ref = imgs["xla_chunked"]
    for k in ("highest", "high", "default"):
        d = np.abs(imgs[k] - ref)
        print(f"{k:8s} vs chunked: max {d.max():.3e}  mean {d.mean():.3e}  "
              f"npix>1e-3 {(d.max(-1) > 1e-3).sum()}")


if __name__ == "__main__":
    main()
