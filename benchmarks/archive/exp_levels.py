"""Throwaway experiment: per-level wavefront statistics on the bench scene.

Replays the level loop in Python (bob 1080p depth-3) and reports, per level:
live rays, live tiles, and mean visible chunks per live tile for the closest
and shadow queries — the drivers of sweep cost at deep levels.
"""
from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def main():
    from realtrace_tpu.apps import scenes
    from realtrace_tpu.core.types import RenderConfig, WAVEFRONT_TILE
    from realtrace_tpu.ops import accel
    from realtrace_tpu.ops.intersect import closest_hit
    from realtrace_tpu.ops.pallas import trace as ptrace
    from realtrace_tpu.render import shade
    from realtrace_tpu.render.pipeline import _tiled_rays

    cfg = RenderConfig(max_depth=3, accel="pallas", chunk_size=64)
    scene, cam = scenes.serial_obj_scene(
        texture_path="/root/reference/Serial/bob_diffuse.png", dtype=jnp.float32)
    scene = accel.with_chunks(scene, cfg)
    camera = scenes.make_camera(cam, 1920, 1080, dtype=jnp.float32)
    ro, rd, coeff, _ = _tiled_rays(camera)
    if coeff is None:
        coeff = jnp.ones_like(ro)
    pack = ptrace.build_pack(scene, cfg)
    tile = WAVEFRONT_TILE
    nt = ro.shape[0] // tile

    def stats(name, o, d, live):
        o2, d2 = shade._park_dead(o, d, live)
        _, _, counts = ptrace._chunk_mask(o2.astype(jnp.float32), d2.astype(jnp.float32),
                                       pack.lo, pack.hi, nt)
        c = np.asarray(counts).ravel()
        lt = int(np.asarray(jnp.any(live.reshape(nt, tile), axis=1)).sum())
        print(f"  {name:10s} live rays {int(np.asarray(live).sum()):8d}  "
              f"live tiles {lt:5d}/{nt}  chunks: sum {c.sum():6d} "
              f"mean/liveTile {c.sum()/max(lt,1):6.2f}  max {c.max():4d}")

    for level in range(cfg.max_depth + 1):
        live = np.asarray(jnp.any(coeff > 0.0, axis=-1))
        print(f"level {level}:")
        live_j = jnp.asarray(live)
        stats("closest", ro, rd, live_j)
        hit = closest_hit(scene, *shade._park_dead(ro, rd, live_j), cfg, pack=pack)
        # shadow query rays
        hp = hit.position
        lp = scene.lights.position[0][None, :]
        to_l = lp - hp
        so = hp + cfg.shadow_origin_bias * to_l
        sd = to_l / jnp.linalg.norm(to_l, axis=-1, keepdims=True)
        stats("shadow", so, sd, live_j & np.asarray(hit.valid))
        contrib, (ro_r, rd_r, coeff_r), _ = shade._children(
            scene, hit, ro, rd, coeff, cfg, pack=pack)
        ro, rd, coeff = ro_r, rd_r, coeff_r


if __name__ == "__main__":
    main()
