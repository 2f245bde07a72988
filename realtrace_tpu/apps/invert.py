"""Inverse-rendering demo CLI: optimize scene parameters to match a target
image — the framework's "training" entry point (the capability the reference
lacks entirely; north-star requirement).

Example (recover a perturbed sphere albedo):

    python -m realtrace_tpu.apps.invert --scene sphere_plane \
        --fields sph_color --steps 100 --lr 0.05 --out-dir /tmp/invert --cpu
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

import jax


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--scene", choices=["sphere_plane", "primitives", "serial"],
                   default="sphere_plane")
    p.add_argument("--obj", default=None)
    p.add_argument("--target", default=None,
                   help="target PNG; default: render the unperturbed scene")
    p.add_argument("--fields", nargs="+", default=["sph_color"],
                   help="scene fields to optimize (e.g. sph_color tri_vertices lights)")
    p.add_argument("--perturb", type=float, default=0.3,
                   help="synthetic-perturbation magnitude when no --target given")
    p.add_argument("--width", type=int, default=64)
    p.add_argument("--height", type=int, default=48)
    p.add_argument("--depth", type=int, default=2)
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--lr", type=float, default=3e-2)
    p.add_argument("--accel", default="bruteforce")
    p.add_argument("--ckpt-every", type=int, default=0,
                   help="save train state every N steps (0 = off)")
    p.add_argument("--out-dir", default=None)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args(argv)
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np
    import optax

    from realtrace_tpu.apps import scenes
    from realtrace_tpu.core.types import RenderConfig
    from realtrace_tpu.diff import checkpoint as ckpt
    from realtrace_tpu.diff.inverse import apply_params, make_train_step
    from realtrace_tpu.io.image import load_png, save_png
    from realtrace_tpu.ops import accel
    from realtrace_tpu.render.pipeline import render_buffer, render_image

    cfg = RenderConfig(max_depth=args.depth, accel=args.accel)
    if args.scene == "primitives":
        scene, cam = scenes.full_primitive_scene()
    elif args.scene == "serial":
        scene, cam = scenes.serial_obj_scene(args.obj)
    else:
        scene, cam = scenes.sphere_plane_scene()
    if args.accel != "bruteforce" and scene.n_triangles:
        scene = accel.with_chunks(scene, cfg)
    camera = scenes.make_camera(cam, args.width, args.height)

    if args.target:
        # PNG is top-down; the loss works in bottom-up buffer order
        target = jnp.asarray(load_png(args.target)[::-1], jnp.float32).reshape(-1, 3)
    else:
        target = render_buffer(scene, camera, cfg)
        # perturb the requested fields so there is something to recover
        key = jax.random.PRNGKey(0)
        upd = {}
        for f in args.fields:
            leaf = getattr(scene, f)
            if hasattr(leaf, "position"):  # Lights pytree
                leaf = leaf.replace(intensity=leaf.intensity * (1.0 + args.perturb))
            elif hasattr(leaf, "ka"):      # Materials pytree
                leaf = leaf.replace(kd=leaf.kd * (1.0 - args.perturb))
            else:
                key, k = jax.random.split(key)
                leaf = leaf + args.perturb * jax.random.normal(k, leaf.shape, leaf.dtype)
            upd[f] = leaf
        scene = scene.replace(**upd)

    step, params, opt_state = make_train_step(
        scene, camera, cfg, target, optimizer=optax.adam(args.lr),
        fields=tuple(args.fields))
    out_dir = Path(args.out_dir) if args.out_dir else None
    if out_dir:
        out_dir.mkdir(parents=True, exist_ok=True)
    loss0 = None
    for i in range(args.steps):
        params, opt_state, loss = step(params, opt_state)
        if loss0 is None:
            loss0 = float(loss)
        if i % max(args.steps // 10, 1) == 0:
            print(f"[invert] step {i:5d} loss {float(loss):.3e}", file=sys.stderr)
        if args.ckpt_every and out_dir and (i + 1) % args.ckpt_every == 0:
            ckpt.save_train_state(out_dir / "ckpt", i + 1, params, opt_state)
    print(f"[invert] loss {loss0:.3e} -> {float(loss):.3e} "
          f"({float(loss) / max(loss0, 1e-30):.2e}x)", file=sys.stderr)
    if out_dir:
        final = render_image(apply_params(scene, params), camera, cfg)
        save_png(out_dir / "recovered.png", final)
        tgt_img = np.clip(np.asarray(target).reshape(args.height, args.width, 3)[::-1], 0, 1)
        save_png(out_dir / "target.png", tgt_img)
        print(f"[invert] wrote {out_dir}/recovered.png", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
