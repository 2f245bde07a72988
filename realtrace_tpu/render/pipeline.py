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
def _tile_maps(width: int, height: int):
    """Tile-major pixel maps: each run of WAVEFRONT_TILE wavefront slots is a
    spatially compact 32x32 pixel tile (vs a scanline strip) — fewer visible
    accel chunks per kernel tile AND finer-grained inter-level compaction.
    The image is padded up to the tile grid; pad slots render as parked
    zero-coefficient rays (zero accel work, not counted in ray stats).

    Returns (ii, jj, valid, inv): per padded wavefront slot the pixel column
    ``ii`` and row-from-bottom ``jj`` (int32, 0 on pads), ``valid`` bool, and
    ``inv`` (H*W,) = wavefront position of each original buffer index — rays
    are GENERATED in tile-major order, so there is no forward permutation.
    """
    th = tw = 32
    assert th * tw == WAVEFRONT_TILE
    hp = -(-height // th) * th
    wp = -(-width // tw) * tw

    def tilemajor(grid):
        return (grid.reshape(hp // th, th, wp // tw, tw)
                .transpose(0, 2, 1, 3).reshape(-1))

    jj_g, ii_g = np.meshgrid(np.arange(hp), np.arange(wp), indexing="ij")
    ii = tilemajor(ii_g)
    jj = tilemajor(jj_g)
    valid = (ii < width) & (jj < height)
    pos = tilemajor(np.arange(hp * wp).reshape(hp, wp))  # slot -> ...
    padpos = np.empty(hp * wp, np.int64)                 # grid linear -> slot
    padpos[pos] = np.arange(hp * wp)
    padpos = padpos.reshape(hp, wp)
    inv = padpos[:height, :width].reshape(-1)            # (j, i) -> slot
    ii = np.where(valid, ii, 0).astype(np.int32)
    jj = np.where(valid, jj, 0).astype(np.int32)
    return ii, jj, valid, inv


def _untile(buf: Array, camera: Camera) -> Array:
    """Tile-major wavefront buffer → row-major (H*W, 3) buffer.

    Pure reshape/transpose/crop (runs at HBM bandwidth) — the equivalent
    ``buf[inv]`` per-pixel row gather costs ~15ms at 2M rays on TPU.
    """
    th = tw = 32
    hp = -(-camera.height // th) * th
    wp = -(-camera.width // tw) * tw
    img = (buf.reshape(hp // th, wp // tw, th, tw, 3)
           .transpose(0, 2, 1, 3, 4).reshape(hp, wp, 3))
    return img[:camera.height, :camera.width].reshape(-1, 3)


def _tiled_rays(camera: Camera):
    """Tile-major padded wavefront inputs: (ro, rd, coeff, inv).

    Rays are generated directly at tile-major pixel coordinates (pure
    elementwise math — no permutation gather). ``coeff`` is None when the
    image divides the tile grid exactly (no padding); otherwise zero on pad
    slots so they are parked from level 0.
    """
    ii, jj, valid, inv = _tile_maps(camera.width, camera.height)
    rd = camera.ray_directions_at(ii, jj)
    dt = rd.dtype
    ro = jnp.broadcast_to(camera.position, rd.shape)
    if valid.all():
        return ro, rd, None, inv
    vmask = jnp.asarray(valid[:, None])
    ro = jnp.where(vmask, ro, jnp.asarray(PARK_DISTANCE, dt))
    park_d = jnp.zeros((3,), dt).at[0].set(1.0)
    rd = jnp.where(vmask, rd, park_d[None, :])
    coeff = jnp.broadcast_to(jnp.where(vmask, jnp.ones((), dt), jnp.zeros((), dt)),
                             (valid.size, 3))
    return ro, rd, coeff, inv


def _primary_features(camera: Camera, cfg: RenderConfig):
    """Accel feature matrix (FEAT, R) for the primary wavefront, built ROW-
    MAJOR straight from the camera math — each row is elementwise in (i, j),
    so no (R, 16) → (16, R) relayout of the whole wavefront (measured ~3ms
    at 1080p). Bitwise-matches ops/pallas/trace._features: direction rows are
    normalized in camera precision then cast to f32, and the derived rows
    (rd x ro, 1/rd) are computed in f32 from the already-masked components.
    """
    from realtrace_tpu.ops.intersect import BIG as BIG_F
    from realtrace_tpu.ops.pallas.trace import FEAT

    f32 = jnp.float32
    ii, jj, valid, _ = _tile_maps(camera.width, camera.height)
    dx, dy, dz = (c.astype(f32) for c in camera.ray_direction_rows(ii, jj))
    px, py, pz = (camera.position.astype(f32)[k] for k in range(3))
    one = jnp.ones_like(dx)
    if not valid.all():
        v = jnp.asarray(valid)
        park = jnp.asarray(PARK_DISTANCE, f32)
        rox, roy, roz = (jnp.where(v, p, park) for p in (px, py, pz))
        rox, roy, roz = (jnp.broadcast_to(r, dx.shape) for r in (rox, roy, roz))
        dx = jnp.where(v, dx, 1.0)
        dy = jnp.where(v, dy, 0.0)
        dz = jnp.where(v, dz, 0.0)
    else:
        rox, roy, roz = (jnp.broadcast_to(p, dx.shape) for p in (px, py, pz))
    qx = dy * roz - dz * roy
    qy = dz * rox - dx * roz
    qz = dx * roy - dy * rox
    inv = [jnp.where(d != 0.0, 1.0 / jnp.where(d != 0.0, d, 1.0), BIG_F)
           for d in (dx, dy, dz)]
    pad = jnp.zeros_like(dx)
    rows = [one, rox, roy, roz, dx, dy, dz, qx, qy, qz, *inv] \
        + [pad] * (FEAT - 13)
    return jnp.stack(rows)


def _feat0(scene: Scene, camera: Camera, cfg: RenderConfig):
    if cfg.accel == "pallas" and scene.n_triangles:
        return _primary_features(camera, cfg)
    return None


def _traced(scene: Scene, ro, rd, coeff, feat0, cfg: RenderConfig,
            branching, with_stats: bool = False):
    """trace_wavefront behind an optional rematerialized-backward wrapper.

    A full 1080p frame's naive backward saves every intermediate (measured
    89 GB of residuals — 5x over HBM). ``cfg.remat`` recomputes the cheap XLA
    shading in the backward instead, SAVING only the accel sweep results (the
    values tagged "sweep" in ops/intersect): the backward replays the
    differentiable attribute/shading math but never re-runs a Pallas sweep —
    the residual-caching design the forward/backward split was built for.
    No effect on forward-only renders.
    """
    if branching is None:
        # resolve pre-wrap: checkpoint traces its operand function, and
        # has_dielectrics inspects concrete values
        branching = scene.has_dielectrics()

    # (the remat itself is applied PER BOUNCE-LEVEL inside trace_wavefront —
    # a whole-frame checkpoint region measured WORSE: XLA's
    # recompute-in-backward of the full frame ballooned to 330GB of temps)
    return trace_wavefront(scene, ro, rd, cfg, branching=branching,
                           coeff=coeff, with_stats=with_stats, feat0=feat0)


def render_buffer(scene: Scene, camera: Camera, cfg: RenderConfig,
                  branching: bool | None = None) -> Array:
    """Render to a flat (H*W, 3) linear color buffer (unclamped)."""
    ro, rd, coeff, _ = _tiled_rays(camera)
    buf = _traced(scene, ro, rd, coeff, _feat0(scene, camera, cfg), cfg,
                  branching)
    return _untile(buf, camera)


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
    ro, rd, coeff, _ = _tiled_rays(camera)
    accum, nrays = _traced(scene, ro, rd, coeff, _feat0(scene, camera, cfg),
                           cfg, branching, with_stats=True)
    img = jnp.clip(image_from_buffer(_untile(accum, camera), camera), 0.0, 1.0)
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
