"""Progressive, resumable rendering — the TPU analog of the serial engine's
column-cursor loop (`RenderEngine::renderLoop` renders one column per idle
tick and keeps a static cursor, Serial/renderengine.cpp:10-26).

Columns are too small for a TPU; the unit here is a row-band of pixels. The
cursor + partial framebuffer are host state that can be saved/loaded, making
long renders resumable (SURVEY §5 checkpoint/resume parity).
"""
from __future__ import annotations

from pathlib import Path

import jax
import numpy as np

from realtrace_tpu.core.types import RenderConfig, Scene
from realtrace_tpu.render.camera import Camera
from realtrace_tpu.render.shade import trace_wavefront


class ProgressiveRenderer:
    """Renders ``band`` pixel rows per ``step()`` call; ``done`` when the
    cursor wraps (renderLoop's True return)."""

    def __init__(self, scene: Scene, camera: Camera, cfg: RenderConfig,
                 band: int = 64, branching: bool | None = None):
        if camera.height % band:
            raise ValueError(f"height {camera.height} not divisible by band {band}")
        self.scene = scene
        self.camera = camera
        self.cfg = cfg
        self.band = band
        self.cursor = 0
        self.buffer = np.zeros((camera.height, camera.width, 3), np.float32)
        branching = scene.has_dielectrics() if branching is None else branching

        def band_fn(scene, camera, j0):
            rd = camera.ray_directions_tile(0, j0.astype(scene.dtype),
                                            camera.width, band)
            import jax.numpy as jnp
            ro = jnp.broadcast_to(camera.position, rd.shape)
            buf = trace_wavefront(scene, ro, rd, cfg, branching=branching)
            return jnp.clip(buf.reshape(band, camera.width, 3), 0.0, 1.0)

        self._band_fn = jax.jit(band_fn)

    @property
    def done(self) -> bool:
        return self.cursor >= self.camera.height

    def step(self) -> bool:
        """Render the next band; returns True when the image is complete."""
        if self.done:
            return True
        import jax.numpy as jnp
        j0 = jnp.asarray(self.cursor)
        tile = np.asarray(self._band_fn(self.scene, self.camera, j0))
        self.buffer[self.cursor:self.cursor + self.band] = tile
        self.cursor += self.band
        return self.done

    def render_all(self) -> np.ndarray:
        while not self.step():
            pass
        return self.image()

    def image(self) -> np.ndarray:
        """Top-down image of everything rendered so far."""
        return self.buffer[::-1].copy()

    # -- resume support (SURVEY §5: progressive cursor → checkpointable) ---
    def save(self, path: str | Path) -> None:
        np.savez(path, cursor=self.cursor, buffer=self.buffer)

    def load(self, path: str | Path) -> None:
        d = np.load(path)
        self.cursor = int(d["cursor"])
        self.buffer = d["buffer"].copy()
