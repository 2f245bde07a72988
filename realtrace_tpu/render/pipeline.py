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

from realtrace_tpu.core.types import PARK_DISTANCE, WAVEFRONT_TILE, RenderConfig, Scene
from realtrace_tpu.render.camera import Camera, image_from_buffer
from realtrace_tpu.render.shade import trace_wavefront


@functools.lru_cache(maxsize=16)
def _tile_perm(width: int, height: int):
    """Pixel→wavefront permutation grouping each run of WAVEFRONT_TILE rays
    into a spatially compact 32x32 pixel tile (vs a scanline strip): fewer
    visible accel chunks per kernel tile AND finer-grained inter-level
    compaction. The image is padded up to the tile grid; pad slots carry -1
    and render as parked zero-coefficient rays (zero accel work, not counted
    in ray stats).

    Returns (perm, inv): perm (Hp*Wp,) int64 = original buffer index or -1;
    inv (H*W,) int64 = tile-major position of each original pixel.
    """
    th = tw = 32
    assert th * tw == WAVEFRONT_TILE
    hp = -(-height // th) * th
    wp = -(-width // tw) * tw
    idx = np.full((hp, wp), -1, np.int64)
    jj, ii = np.meshgrid(np.arange(height), np.arange(width), indexing="ij")
    idx[:height, :width] = ii + jj * width
    perm = (idx.reshape(hp // th, th, wp // tw, tw)
            .transpose(0, 2, 1, 3).reshape(-1))
    inv = np.empty(height * width, np.int64)
    pos = np.nonzero(perm >= 0)[0]
    inv[perm[pos]] = pos
    return perm, inv


def _tiled_rays(camera: Camera):
    """Tile-major padded wavefront inputs: (ro, rd, coeff, inv).

    ``coeff`` is None when the image divides the tile grid exactly (no pad);
    otherwise zero on pad slots so they are parked from level 0.
    """
    ro = camera.ray_origins()
    rd = camera.ray_directions()
    perm, inv = _tile_perm(camera.width, camera.height)
    if perm.size == ro.shape[0]:        # exact tiling, no padding
        return ro[perm], rd[perm], None, inv
    valid = perm >= 0
    safe = np.maximum(perm, 0)
    dt = ro.dtype
    vmask = jnp.asarray(valid[:, None])
    ro_p = jnp.where(vmask, ro[safe], jnp.asarray(PARK_DISTANCE, dt))
    park_d = jnp.zeros((3,), dt).at[0].set(1.0)
    rd_p = jnp.where(vmask, rd[safe], park_d[None, :])
    coeff = jnp.where(vmask, jnp.ones((), dt), jnp.zeros((), dt))
    coeff = jnp.broadcast_to(coeff, (perm.size, 3))
    return ro_p, rd_p, coeff, inv


def render_buffer(scene: Scene, camera: Camera, cfg: RenderConfig,
                  branching: bool | None = None) -> Array:
    """Render to a flat (H*W, 3) linear color buffer (unclamped)."""
    ro, rd, coeff, inv = _tiled_rays(camera)
    buf = trace_wavefront(scene, ro, rd, cfg, branching=branching, coeff=coeff)
    return buf[inv]


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
    ro, rd, coeff, inv = _tiled_rays(camera)
    accum, nrays = trace_wavefront(scene, ro, rd, cfg, branching=branching,
                                   coeff=coeff, with_stats=True)
    img = jnp.clip(image_from_buffer(accum[inv], camera), 0.0, 1.0)
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
