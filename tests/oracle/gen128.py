"""One-time generator for the committed 128x128 golden artifact.

Run from the repo root:  python tests/oracle/gen128.py
Writes tests/oracle/golden128.npz (float64 oracle render of scene128).
"""
from __future__ import annotations

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np

from oracle.cpu_reference import OracleRenderer
from oracle.scene128 import CAM, SIZE, build_scene128, config


def main():
    from realtrace_tpu.apps import scenes

    scene = build_scene128()
    import jax.numpy as jnp

    cam = scenes.make_camera(CAM, SIZE, SIZE, dtype=jnp.float64)
    t0 = time.time()
    img = OracleRenderer(scene, config()).render(cam)
    print(f"oracle render {SIZE}x{SIZE}: {time.time() - t0:.1f}s")
    out = pathlib.Path(__file__).parent / "golden128.npz"
    np.savez_compressed(out, image=np.asarray(img, np.float64))
    print(f"wrote {out} ({out.stat().st_size / 1024:.0f} KiB)")


if __name__ == "__main__":
    main()
