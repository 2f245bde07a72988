"""Differentiable / inverse rendering: gradients of pixel loss w.r.t. scene
parameters, and the optimization step that is this framework's "training".

The reference has no backward pass — differentiability is the new capability
demanded by the north star (BASELINE.json): pixel gradients flow to vertex
positions, per-vertex colors (texels), material scalars, and light parameters.
Discrete visibility (hit selection, shadow booleans) is held fixed via
stop_gradient inside the trace ops; everything else is exact autodiff through
the wavefront scan.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from jax import Array

from realtrace_tpu.core.types import RenderConfig, Scene
from realtrace_tpu.render.camera import Camera
from realtrace_tpu.render.pipeline import render_buffer
from realtrace_tpu.render.shade import trace_wavefront

# scene leaves that receive gradients (everything float; the chunk perm and
# counts stay static)
DIFF_FIELDS = (
    "tri_vertices", "tri_colors", "tri_materials",
    "sph_center", "sph_radius", "sph_color", "sph_materials",
    "pln_corners", "pln_color", "pln_materials",
    "cyl_center", "cyl_up", "cyl_radius", "cyl_color", "cyl_materials",
    "lights", "ambient", "background",
)


def scene_params(scene: Scene, fields=DIFF_FIELDS) -> dict:
    """Extract the differentiable sub-pytree of a scene."""
    return {f: getattr(scene, f) for f in fields}


def apply_params(scene: Scene, params: dict) -> Scene:
    """Write an updated parameter dict back into the scene."""
    return scene.replace(**params)


def render_loss(params: dict, scene: Scene, camera: Camera, cfg: RenderConfig,
                target: Array, branching: bool,
                resort: bool = False) -> Array:
    """Mean-squared pixel loss of the *unclamped* linear render vs target.

    (Unclamped so gradients don't die on saturated pixels; the clamp is a
    display transform, Serial/renderengine.cpp:15-17.) ``resort`` rebuilds the
    accel chunk ordering on device from the CURRENT vertex params before
    rendering — required for exact-speed sweeps when vertices are being
    optimized (the ordering, unlike the per-trace AABBs, is otherwise stale).
    """
    s = apply_params(scene, params)
    if resort and cfg.accel != "bruteforce" and s.n_triangles:
        from realtrace_tpu.ops import accel
        s = accel.resort_chunks(s, cfg)
    buf = render_buffer(s, camera, cfg, branching=branching)
    return jnp.mean((buf - target.reshape(-1, 3)) ** 2)


def make_train_step(scene: Scene, camera: Camera, cfg: RenderConfig, target: Array,
                    optimizer: optax.GradientTransformation | None = None,
                    fields=DIFF_FIELDS, resort_chunks: bool | None = None):
    """Build (jitted_step, params0, opt_state0) for inverse rendering.

    ``target`` is the flat or (H,W,3) goal image in linear color. One step =
    value_and_grad of the full differentiable render + optax update — the
    framework's "training step" (and the thing the multi-chip path shards).

    ``resort_chunks`` (default: on exactly when vertices are optimized with a
    chunked accel) rebuilds the Morton chunk ordering on device every step —
    the analog of the CUDA GPU-side grid rebuild (Parellel/kernel.cu:457-522),
    keeping the sweep's chunk AABBs tight as geometry moves.
    """
    branching = scene.has_dielectrics()
    optimizer = optimizer or optax.adam(1e-2)
    params0 = scene_params(scene, fields)
    opt_state0 = optimizer.init(params0)
    tgt = target.reshape(-1, 3)
    if resort_chunks is None:
        resort_chunks = "tri_vertices" in fields and cfg.accel != "bruteforce"

    @jax.jit
    def step(params, opt_state):
        loss, grads = jax.value_and_grad(render_loss)(
            params, scene, camera, cfg, tgt, branching, resort_chunks)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step, params0, opt_state0


def image_grad(scene: Scene, camera: Camera, cfg: RenderConfig,
               loss_fn: Callable[[Array], Array] | None = None,
               fields=DIFF_FIELDS) -> tuple[Array, dict]:
    """(loss, d loss / d scene-params) for an arbitrary image functional.

    Default functional: mean pixel luminance (handy for finite-difference
    validation, BASELINE config 4).
    """
    loss_fn = loss_fn or (lambda buf: jnp.mean(buf))
    params = scene_params(scene, fields)
    branching = scene.has_dielectrics()

    def f(p):
        buf = render_buffer(apply_params(scene, p), camera, cfg, branching=branching)
        return loss_fn(buf)

    return jax.value_and_grad(f)(params)
