"""Animated interactive-camera flythrough (BASELINE config 5 scene driver).

The headless equivalent of the reference's GLUT interactive loop
(Parellel/main.cu:101-113 + interactive_camera orbit model): the orbit camera
sweeps yaw/pitch while the jitted frame function re-renders — camera params
are traced arguments, so the sweep runs with ONE compilation (the analog of
the per-frame `cudaMemcpy` camera upload, Parellel/main.cu:108).
"""
from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import jax


def run_flythrough(scene, interactive_cam, cfg, frames: int = 24,
                   yaw_step: float = 0.26, pitch_amp: float = 0.2,
                   out_dir: str | None = None, dtype=None, mesh=None):
    """Render an orbit sweep; returns (images, mean_fps).

    ``mesh``: a jax.sharding.Mesh — the animated camera then drives
    ``parallel.mesh.sharded_render`` (pixel tiles sharded over the mesh,
    BASELINE config 5: interactive-camera flythrough over a device mesh).
    The camera stays a traced argument, so the whole sharded sweep reuses
    ONE compilation.
    """
    import math

    import jax.numpy as jnp

    from realtrace_tpu.io.image import save_png
    from realtrace_tpu.render.pipeline import render_with_stats
    from realtrace_tpu.utils.profiling import FrameTimer, block, frame_bracket

    dtype = dtype or jnp.float32
    if mesh is not None:
        from realtrace_tpu.parallel import mesh as pmesh
        scene = pmesh.replicate_scene(scene, mesh)
        # sharded path: ray count = pixels (primary) is reported by the
        # caller's FPS line; per-bounce counts stay device-side
        frame_fn = jax.jit(lambda s, c: (
            pmesh.sharded_render(s, c, cfg, mesh, branching=False),
            jnp.zeros(())))
    else:
        frame_fn = jax.jit(lambda s, c: render_with_stats(s, c, cfg, branching=False))

    images = []
    timer = FrameTimer(window=1e9)
    base_pitch = interactive_cam.pitch
    t_start = None
    for i in range(frames):
        interactive_cam.change_yaw(yaw_step)
        interactive_cam.pitch = base_pitch
        interactive_cam.change_pitch(pitch_amp * math.sin(2 * math.pi * i / frames))
        camera = interactive_cam.build_render_camera(dtype=dtype)
        with frame_bracket(f"flythrough_frame_{i}"):
            img, nrays = frame_fn(scene, camera)
            block(img)
        if i == 0:
            t_start = time.perf_counter()   # exclude compile from FPS
        else:
            timer.frame(float(nrays))
        images.append(img)
        if out_dir:
            save_png(Path(out_dir) / f"frame_{i:04d}.png", img)
    dt = time.perf_counter() - t_start if frames > 1 else 0.0
    fps = (frames - 1) / dt if dt > 0 else 0.0
    return images, fps


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--obj", default=None)
    p.add_argument("--width", type=int, default=512)
    p.add_argument("--height", type=int, default=512)
    p.add_argument("--frames", type=int, default=24)
    p.add_argument("--radius", type=float, default=120.0)
    p.add_argument("--depth", type=int, default=2)
    p.add_argument("--accel", default=None,
                   help="default: the exact mode for the backend")
    p.add_argument("--mesh", type=int, default=0,
                   help="shard pixel tiles over an N-device mesh "
                        "(BASELINE config 5; 0 = single device)")
    p.add_argument("--out-dir", default=None)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args(argv)
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from realtrace_tpu.apps import scenes
    from realtrace_tpu.core.types import RenderConfig
    from realtrace_tpu.ops import accel
    from realtrace_tpu.render.camera import InteractiveCamera

    accel_mode = args.accel or accel.default_exact_accel()
    cfg = RenderConfig(max_depth=args.depth, accel=accel_mode)
    accel.warn_if_approximate(cfg)
    scene, _ = scenes.serial_obj_scene(args.obj, dtype=jnp.float32)
    if accel_mode != "bruteforce":
        scene = accel.with_chunks(scene, cfg)
    cam = InteractiveCamera(radius=args.radius,
                            resolution=(args.width, args.height))
    if args.out_dir:
        Path(args.out_dir).mkdir(parents=True, exist_ok=True)
    mesh = None
    if args.mesh:
        from realtrace_tpu.parallel import mesh as pmesh
        mesh = pmesh.make_mesh(args.mesh)
    _, fps = run_flythrough(scene, cam, cfg, frames=args.frames,
                            out_dir=args.out_dir, mesh=mesh)
    tag = f" (sharded over {args.mesh} devices)" if mesh is not None else ""
    print(f"[INFO] flythrough: {args.frames} frames @ {fps:.2f} fps{tag}",
          file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
