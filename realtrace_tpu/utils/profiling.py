"""Profiling / observability utilities.

Replaces the reference's instrumentation: the GLUT FPS title-bar counter
(Parellel/main.cu:79-85), the per-frame cudaProfilerStart/Stop bracket
(Parellel/kernel.cu:569,603), and the [INFO] transfer-size logs
(Parellel/main.cu:239-241).
"""
from __future__ import annotations

import contextlib
import logging
import time
from dataclasses import dataclass, field

import jax

log = logging.getLogger("realtrace_tpu")


def block(x):
    """Synchronize (the cudaDeviceSynchronize analog for timing)."""
    return jax.block_until_ready(x)


@dataclass
class FrameTimer:
    """Rolling FPS / rays-per-second counter (1s sampling window, like the
    reference's glutTimerFunc counter)."""

    window: float = 1.0
    _frames: int = 0
    _rays: float = 0.0
    _t0: float = field(default_factory=time.perf_counter)
    fps: float = 0.0
    mrays_per_s: float = 0.0

    def frame(self, n_rays: float = 0.0) -> bool:
        """Record one finished frame; returns True when the window rolled."""
        self._frames += 1
        self._rays += float(n_rays)
        dt = time.perf_counter() - self._t0
        if dt >= self.window:
            self.fps = self._frames / dt
            self.mrays_per_s = self._rays / dt / 1e6
            self._frames = 0
            self._rays = 0.0
            self._t0 = time.perf_counter()
            return True
        return False

    def title(self) -> str:
        """Window-title string, the TITLE_STRING analog (Parellel/interactions.h:6)."""
        return f"RealTrace-TPU | {self.fps:6.2f} fps | {self.mrays_per_s:8.2f} Mrays/s"


@contextlib.contextmanager
def frame_bracket(label: str = "frame"):
    """Named profiler bracket: the cudaProfilerStart/Stop analog, emitting a
    TraceAnnotation visible in a captured jax.profiler trace."""
    with jax.profiler.TraceAnnotation(label):
        yield


@contextlib.contextmanager
def trace_capture(logdir: str):
    """Capture a device trace for one scope (open with TensorBoard/XProf)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def timed(fn, *args, repeats: int = 5, warmup: int = 1):
    """Wall-time a jitted callable with device sync; returns (mean_s, result)."""
    result = None
    for _ in range(warmup):
        result = block(fn(*args))
    t0 = time.perf_counter()
    for _ in range(repeats):
        result = fn(*args)
    block(result)
    return (time.perf_counter() - t0) / repeats, result


def log_transfer(name: str, tree) -> None:
    """Byte-count log before scene upload ([INFO] analog, Parellel/main.cu:239)."""
    n = sum(x.size * x.dtype.itemsize for x in jax.tree_util.tree_leaves(tree)
            if hasattr(x, "size"))
    log.info("[INFO] %s: %.2f KB to be transferred to device", name, n / 1024)
