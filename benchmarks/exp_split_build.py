"""Round-3 experiment: Morton vs median-split chunk partition quality.

Builds both chunk permutations for bob, then compares (a) total chunk-AABB
surface area, (b) mean visible chunks/tile under the octant-interval mask
for the REAL primary + shadow wavefronts of the headline and hit-heavy
framings (CPU mask arithmetic only — no kernel). Decides whether a better
static partition is worth wiring in.

Run: python benchmarks/exp_split_build.py   (CPU, ~3min)
"""
from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np


# (the split builder graduated into the package: accel.build_chunk_perm_split)


def chunk_stats(tag, perm, tv, cfg, wavefronts, nt, LANES, _chunk_mask):
    c = cfg.chunk_size
    tvc = np.asarray(tv, np.float64)[perm].reshape(-1, c, 3, 3)
    lo = jnp.asarray(tvc.min(axis=(1, 2)), jnp.float32)
    hi = jnp.asarray(tvc.max(axis=(1, 2)), jnp.float32)
    d = np.asarray(hi - lo, np.float64)
    area = float((d[:, 0] * d[:, 1] + d[:, 1] * d[:, 2] + d[:, 0] * d[:, 2]).sum() * 2)
    print(f"[{tag}] total chunk surface area {area:9.1f}")
    for name, (ro_w, rd_w) in wavefronts.items():
        _, _, cnt = _chunk_mask(ro_w[: nt * LANES], rd_w[: nt * LANES], lo, hi, nt)
        mean = float(jnp.sum(cnt)) / nt
        print(f"[{tag}] {name:18s} mean chunks/tile {mean:7.2f}")


def main():
    from realtrace_tpu.apps import scenes
    from realtrace_tpu.core.types import RenderConfig
    from realtrace_tpu.ops import accel
    from realtrace_tpu.ops.pallas import trace as pt
    from realtrace_tpu.render.shade import closest_query, hit_attributes, _shadow_targets

    w, h = 480, 272
    cfg = RenderConfig(max_depth=3, accel="pallas", chunk_size=32)
    scene, cam = scenes.serial_obj_scene(
        texture_path="/root/reference/Serial/bob_diffuse.png", dtype=jnp.float32)
    tv = scene.tri_vertices

    perm_m = accel.build_chunk_perm(tv, cfg.chunk_size)
    perm_s = accel.build_chunk_perm_split(tv, cfg.chunk_size)

    for camname, pos in (("headline", None), ("hit-heavy", (0.0, 6.0, 14.0))):
        cam_d = dict(cam) if pos is None else dict(cam, position=pos)
        camera = scenes.make_camera(cam_d, w, h, dtype=jnp.float32)
        rd = camera.ray_directions()
        ro = jnp.broadcast_to(camera.position, rd.shape)
        nt = ro.shape[0] // pt.LANES

        sc = scene.replace(tri_chunk_perm=jnp.asarray(perm_m))
        pack = pt.build_pack(sc, cfg)
        t, fam, idx = closest_query(sc, ro, rd, cfg, pack=pack)
        hit = hit_attributes(sc, ro, rd, t, fam, idx, cfg, pack=pack)
        sh = _shadow_targets(sc, hit.position, hit.valid, cfg)
        wavefronts = {"primary": (ro, rd), "shadow": (sh[0][0], sh[0][1])}
        print(f"== {camname} framing (hit frac {float(jnp.mean(hit.valid)):.2f}) ==")
        chunk_stats("morton", perm_m, tv, cfg, wavefronts, nt, pt.LANES, pt._chunk_mask)
        chunk_stats("split ", perm_s, tv, cfg, wavefronts, nt, pt.LANES, pt._chunk_mask)


if __name__ == "__main__":
    main()
