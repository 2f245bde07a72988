"""Round-3 experiment: predicted chunk-list sizes for the hit-heavy framing.

Pure mask arithmetic on CPU (no kernel): build the REAL level-0 hit points
for the hit-heavy camera at a reduced resolution, derive the shadow-ray and
reflection-child wavefronts, and compare the per-tile visible-chunk list
sizes produced by (a) the octant interval mask and (b) the exact per-ray
mask. Decides whether raising cfg.exact_mask_rays (or a blockwise exact
mask) can cut the hit-heavy sweep's visit counts.

Run: python benchmarks/exp_mask_stats.py  (CPU, ~2min)
"""
from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np


def stats(tag, counts):
    c = np.asarray(counts).reshape(-1)
    print(f"{tag:34s}: mean {c.mean():6.2f}  p50 {np.percentile(c,50):5.0f}  "
          f"p90 {np.percentile(c,90):5.0f}  max {c.max():5.0f}")
    return c.mean()


def main():
    from realtrace_tpu.apps import scenes
    from realtrace_tpu.core.types import RenderConfig
    from realtrace_tpu.ops import accel
    from realtrace_tpu.ops.pallas import trace as pt
    from realtrace_tpu.render.shade import closest_query, hit_attributes, _children_geom, _shadow_targets

    w, h = 480, 272          #同 aspect as 1080p, 16x smaller ray count
    cfg = RenderConfig(max_depth=3, accel="pallas", chunk_size=32)
    scene, cam = scenes.serial_obj_scene(
        texture_path="/root/reference/Serial/bob_diffuse.png", dtype=jnp.float32)
    scene = accel.with_chunks(scene, cfg)
    pack = pt.build_pack(scene, cfg)
    camera = scenes.make_camera(dict(cam, position=(0.0, 6.0, 14.0)), w, h,
                                dtype=jnp.float32)
    rd = camera.ray_directions()
    ro = jnp.broadcast_to(camera.position, rd.shape)
    r = ro.shape[0]
    nt = r // pt.LANES
    print(f"rays {r}, tiles {nt}, chunks {pack.lo.shape[0]}")

    t, fam, idx = closest_query(scene, ro, rd, cfg, pack=pack)
    hit = hit_attributes(scene, ro, rd, t, fam, idx, cfg, pack=pack)
    valid = np.asarray(hit.valid)
    print(f"hit fraction: {valid.mean():.3f}")

    coeff = jnp.ones_like(ro)
    _, _, child_r, child_t = _children_geom(scene, hit, ro, rd, coeff, cfg)
    sh = _shadow_targets(scene, hit.position, hit.valid, cfg)
    wavefronts = {
        "primary": (ro, rd),
        "shadow": (sh[0][0], sh[0][1]),
        "reflect-child": (child_r[0], child_r[1]),
    }

    for name, (ro_w, rd_w) in wavefronts.items():
        ro_w = ro_w[: nt * pt.LANES]
        rd_w = rd_w[: nt * pt.LANES]
        _, _, cnt_i = pt._chunk_mask(ro_w, rd_w, pack.lo, pack.hi, nt)
        _, _, cnt_e = pt._chunk_mask_exact(ro_w, rd_w, pack.lo, pack.hi, nt)
        m_i = stats(f"{name} interval-octant", cnt_i)
        m_e = stats(f"{name} exact per-ray", cnt_e)
        print(f"{name}: exact/interval visit ratio = {m_e / m_i:.3f}")


if __name__ == "__main__":
    main()
