"""realtrace_tpu — a TPU-native differentiable Whitted ray-tracing framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of the
rjalfa/RealTrace reference (serial C++ CPU tracer + CUDA wavefront tracer):
dense SoA scenes, wavefront bounce loops, Morton-chunked AABB-sweep
acceleration, Pallas fused trace kernels, end-to-end differentiability, and
pixel-tile sharding over TPU meshes.
"""

from realtrace_tpu.core.types import (
    Lights,
    Materials,
    RenderConfig,
    Scene,
    SceneBuilder,
)
from realtrace_tpu.render.camera import Camera, InteractiveCamera
from realtrace_tpu.render.pipeline import (
    jit_render,
    render_buffer,
    render_image,
    render_with_stats,
)

__version__ = "0.1.0"

__all__ = [
    "Camera",
    "InteractiveCamera",
    "Lights",
    "Materials",
    "RenderConfig",
    "Scene",
    "SceneBuilder",
    "jit_render",
    "render_buffer",
    "render_image",
    "render_with_stats",
]
