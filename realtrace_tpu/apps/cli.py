"""Headless render CLI — the `_NO_OPENGL` / `CUDA_SERVER` mode as the default
(Parellel/main.cu:29-38,287-290; Serial/lumina.cpp:11-23).

Usage (mirrors `lumina [width] [height]` and `main [obj] [num_max]`):

    python -m realtrace_tpu.apps.cli --width 512 --height 512 \
        --scene serial --obj /root/reference/Serial/bob_tri.obj \
        --texture /root/reference/Serial/bob_diffuse.png --depth 3 \
        --accel chunked --out render.png
"""
from __future__ import annotations

import argparse
import sys
import time

import jax


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="realtrace-tpu", description=__doc__)
    p.add_argument("--width", type=int, default=512)
    p.add_argument("--height", type=int, default=512)
    p.add_argument("--scene", choices=["serial", "parallel", "sphere_plane", "primitives"],
                   default="serial", help="preset scene (SURVEY-referenced setups)")
    p.add_argument("--obj", default=None, help="OBJ mesh path (serial/parallel scenes)")
    p.add_argument("--texture", default=None, help="texture PNG sampled per vertex")
    p.add_argument("--scale", type=float, default=None,
                   help="OBJ scaling factor (default: 15 serial / 2 parallel)")
    p.add_argument("--max-faces", type=int, default=None,
                   help="triangle cap (serial app used 2000)")
    p.add_argument("--depth", type=int, default=3, help="max bounce depth")
    p.add_argument("--accel", choices=["bruteforce", "chunked", "pallas"], default=None,
                   help="default: the EXACT mode for the backend (pallas on "
                        "TPU, bruteforce on CPU); 'chunked' is approximate")
    p.add_argument("--no-shadows", action="store_true")
    p.add_argument("--fixed-diffuse", action="store_true",
                   help="use surface->light diffuse direction instead of the reference quirk")
    p.add_argument("--out", default=None, help="output PNG (default: timestamped)")
    p.add_argument("--repeats", type=int, default=1, help="frames to render (FPS report)")
    p.add_argument("--cpu", action="store_true", help="force the CPU backend")
    p.add_argument("--f64", action="store_true", help="double precision (CPU)")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    if args.f64:
        jax.config.update("jax_enable_x64", True)

    import jax.numpy as jnp

    from realtrace_tpu.apps import scenes
    from realtrace_tpu.core.types import RenderConfig
    from realtrace_tpu.io.image import save_png, save_timestamped_png
    from realtrace_tpu.ops import accel
    from realtrace_tpu.render.pipeline import render_with_stats
    from realtrace_tpu.utils.profiling import FrameTimer, block

    dtype = jnp.float64 if args.f64 else jnp.float32
    accel_mode = args.accel or accel.default_exact_accel()
    cfg = RenderConfig(max_depth=args.depth, accel=accel_mode,
                       shadows=not args.no_shadows,
                       legacy_diffuse=not args.fixed_diffuse)
    accel.warn_if_approximate(cfg)

    if args.scene == "sphere_plane":
        scene, cam = scenes.sphere_plane_scene(dtype=dtype)
    elif args.scene == "primitives":
        scene, cam = scenes.full_primitive_scene(dtype=dtype)
    elif args.scene == "parallel":
        scene, cam = scenes.parallel_obj_scene(args.obj, dtype=dtype,
                                               scale=args.scale or 2.0,
                                               max_faces=args.max_faces)
    else:
        scene, cam = scenes.serial_obj_scene(args.obj, texture_path=args.texture,
                                             dtype=dtype, scale=args.scale or 15.0,
                                             max_faces=args.max_faces)
    if accel_mode != "bruteforce" and scene.n_triangles:
        scene = accel.with_chunks(scene, cfg)
    camera = scenes.make_camera(cam, args.width, args.height, dtype=dtype)
    print(f"[INFO] scene: {scene.n_triangles} tris, {scene.n_spheres} spheres, "
          f"{scene.n_planes} quads, {scene.n_cylinders} cylinders, "
          f"{scene.lights.position.shape[0]} lights", file=sys.stderr)

    frame = jax.jit(lambda s, c: render_with_stats(s, c, cfg, branching=scene.has_dielectrics()))
    t0 = time.perf_counter()
    img, nrays = frame(scene, camera)
    block(img)
    print(f"[INFO] first frame (incl. compile): {time.perf_counter() - t0:.2f}s",
          file=sys.stderr)

    timer = FrameTimer(window=0.0)
    for _ in range(max(args.repeats - 1, 0)):
        img, nrays = frame(scene, camera)
        block(img)
        timer.frame(float(nrays))
    if args.repeats > 1:
        print(f"[INFO] {timer.title()}", file=sys.stderr)

    path = save_png(args.out, img) if args.out else save_timestamped_png(img)
    print(f"Image saved as: {path}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
