"""Top-level render entry points: ray-gen → wavefront trace → image.

The analog of ``RenderEngine::renderLoop`` (Serial/renderengine.cpp:10-26) and
``kernelLauncher`` (Parellel/kernel.cu:564-604) — but the whole frame is one
jitted program: XLA fuses ray-gen, intersection, shading, and accumulation.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array

from realtrace_tpu.core.types import RenderConfig, Scene
from realtrace_tpu.render.camera import Camera, image_from_buffer
from realtrace_tpu.render.shade import trace_wavefront

WAVEFRONT_TILE = 1024  # rays per accel kernel tile (ops/pallas/trace.LANES)


@functools.lru_cache(maxsize=16)
def _tile_perm(width: int, height: int):
    """Pixel permutation grouping each run of WAVEFRONT_TILE rays into a
    spatially compact tile (e.g. 8 rows x 128 cols at 1080p) instead of a
    scanline strip — 3-4x fewer visible accel chunks per kernel tile.
    Returns (perm, inv_perm) numpy arrays, or (None, None) when no tiling
    divides the image.
    """
    for th in (32, 16, 8, 4, 2):
        tw = WAVEFRONT_TILE // th
        if height % th == 0 and width % tw == 0:
            idx = np.arange(height * width).reshape(height, width)
            perm = (idx.reshape(height // th, th, width // tw, tw)
                    .transpose(0, 2, 1, 3).reshape(-1))
            inv = np.empty_like(perm)
            inv[perm] = np.arange(perm.size)
            return perm, inv
    return None, None


def render_buffer(scene: Scene, camera: Camera, cfg: RenderConfig,
                  branching: bool | None = None) -> Array:
    """Render to a flat (H*W, 3) linear color buffer (unclamped)."""
    ro = camera.ray_origins()
    rd = camera.ray_directions()
    perm, inv = _tile_perm(camera.width, camera.height)
    if perm is not None:
        ro, rd = ro[perm], rd[perm]
    buf = trace_wavefront(scene, ro, rd, cfg, branching=branching)
    return buf[inv] if perm is not None else buf


def render_image(scene: Scene, camera: Camera, cfg: RenderConfig,
                 branching: bool | None = None) -> Array:
    """Render a top-down (H, W, 3) image clamped to [0,1].

    Clamp ref: Color::clamp before drawPixel (Serial/renderengine.cpp:15-17).
    """
    buf = render_buffer(scene, camera, cfg, branching=branching)
    return jnp.clip(image_from_buffer(buf, camera), 0.0, 1.0)


def render_with_stats(scene: Scene, camera: Camera, cfg: RenderConfig,
                      branching: bool | None = None):
    """Render + traced-ray count (primary + shadow + secondary), the basis of
    the Mrays/s benchmark metric (replaces the reference FPS counter,
    Parellel/main.cu:79-85).
    """
    ro = camera.ray_origins()
    rd = camera.ray_directions()
    perm, inv = _tile_perm(camera.width, camera.height)
    if perm is not None:
        ro, rd = ro[perm], rd[perm]
    accum, nrays = trace_wavefront(scene, ro, rd, cfg, branching=branching, with_stats=True)
    if perm is not None:
        accum = accum[inv]
    img = jnp.clip(image_from_buffer(accum, camera), 0.0, 1.0)
    return img, nrays


def jit_render(scene: Scene, camera: Camera, cfg: RenderConfig,
               branching: bool | None = None):
    """Build a jitted closure ``frame(scene, camera) -> image`` with cfg (and
    the branching mode) baked in — camera/scene params stay traced so
    interactive camera motion does not retrigger compilation.
    """
    if branching is None:
        branching = scene.has_dielectrics()

    @jax.jit
    def frame(scene: Scene, camera: Camera) -> Array:
        return render_image(scene, camera, cfg, branching=branching)

    return frame


def to_rgba8(img: Array) -> Array:
    """[0,1] float image → uint8 RGBA, the ``convert_to_rgba`` analog
    (Parellel/kernel.cu:356-364)."""
    rgb = jnp.clip(img * 255.0, 0.0, 255.0).astype(jnp.uint8)
    a = jnp.full(rgb.shape[:-1] + (1,), 255, jnp.uint8)
    return jnp.concatenate([rgb, a], axis=-1)
