"""The 128x128 cached-golden scene: deterministic construction shared by the
artifact generator (gen128.py) and the in-suite test (test_golden.py).

Designed to exercise what tiny (24-48 px) golden images cannot see:
tile-boundary handling (128x128 = sixteen 32x32 wavefront tiles), inter-level
compaction (reflective minority), all four primitive families, shadows, and
multi-bounce termination.
"""
from __future__ import annotations

import numpy as np

CAM = dict(position=(10.0, 6.0, 10.0), target=(0.0, 0.0, 0.0),
           up=(0.0, 1.0, 0.0), fovy=45.0)
SIZE = 128
DEPTH = 4


def build_scene128(dtype=None):
    import jax.numpy as jnp

    from realtrace_tpu.core.types import SceneBuilder

    b = SceneBuilder(dtype=dtype or jnp.float64)
    m_refl = b.material(kr=0.6)
    b.add_plane((-20, -2, -20), (20, -2, -20), (20, -2, 20), (-20, -2, 20),
                color=(0.4, 0.4, 0.45), material=m_refl)
    b.add_sphere((0, 0.5, 0), 1.5, color=(0.8, 0.2, 0.1), material=m_refl)
    b.add_sphere((3, 0, 2), 1.0, color=(0.1, 0.6, 0.2), material=b.material())
    b.add_cylinder((-3.0, 0.0, 1.0), (0.0, 1.0, 0.0), 0.6,
                   color=(0.7, 0.6, 0.1), material=b.material(ks=0.6))
    rng = np.random.default_rng(128)
    for ctr in rng.uniform(-6, 6, (48, 3)):
        tri = ctr + np.array([0, 2.5, 0]) + rng.uniform(-1, 1, (3, 3))
        b.add_triangle(tri[0], tri[1], tri[2], material=m_refl,
                       color=tuple(rng.uniform(0.2, 0.9, 3)))
    b.add_light((0, 30, 30), (1, 1, 1))
    b.add_light((-20, 15, -5), (0.3, 0.3, 0.5))
    b.ambient = (1, 1, 1)
    b.background = (0.1, 0.3, 0.6)
    return b.build()


def config(accel="bruteforce", **kw):
    from realtrace_tpu.core.types import RenderConfig

    return RenderConfig(max_depth=DEPTH, accel=accel, chunk_size=32, **kw)
