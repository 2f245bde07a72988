"""Sample-app kernels: the `sampleApp/` tutorial pair rebuilt TPU-style.

Ref: sampleApp/flashlight/kernel.cu:7-19 (distance-to-cursor intensity) and
sampleApp/stability/kernel.cu:4-55 (per-pixel explicit-Euler phase-plane
integration). Both are single jitted XLA programs over the whole image —
the per-pixel CUDA thread becomes a dense (H, W) batch; the time loop becomes
``lax.fori_loop``.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import Array, lax

LEN = 5.0         # sampleApp/stability/kernel.cu:4
TIME_STEP = 0.005
FINAL_TIME = 10.0


@functools.partial(jax.jit, static_argnames=("w", "h"))
def flashlight(w: int, h: int, pos) -> Array:
    """Distance-based intensity image, uint8 RGBA (H, W, 4).

    Ref: distanceKernel, sampleApp/flashlight/kernel.cu:7-19.
    """
    c = jnp.arange(w, dtype=jnp.float32)[None, :]
    r = jnp.arange(h, dtype=jnp.float32)[:, None]
    px = jnp.asarray(pos, jnp.float32)
    d = jnp.sqrt((c - px[0]) ** 2 + (r - px[1]) ** 2)
    inten = jnp.clip(255.0 - d, 0, 255).astype(jnp.uint8)
    zeros = jnp.zeros_like(inten)
    a = jnp.full_like(inten, 255)
    return jnp.stack([inten, inten, zeros, a], axis=-1)


def _rhs(x, y, param, sys):
    """Oscillator right-hand side (ref kernel.cu:13-18): sys 1 = negative
    stiffness, 2 = van der Pol, else linear damped."""
    return lax.switch(
        jnp.clip(sys, 0, 2),
        [lambda: -x - 2.0 * param * y,
         lambda: x - 2.0 * param * y,
         lambda: -x + param * (1.0 - x * x) * y])


@functools.partial(jax.jit, static_argnames=("w", "h"))
def stability(w: int, h: int, param, sys) -> Array:
    """Phase-plane stability image: per-pixel explicit Euler to t=10, colored
    red (growth) / blue (decay) with axes drawn.

    Ref: stabImageKernel + euler, sampleApp/stability/kernel.cu:22-55.
    """
    f32 = jnp.float32
    c = jnp.arange(w, dtype=f32)[None, :]
    r = jnp.arange(h, dtype=f32)[:, None]
    x0 = 2.0 * LEN * (c / w - 0.5)            # scale() (kernel.cu:10)
    y0 = 2.0 * LEN * (r / h - 0.5)
    x0 = jnp.broadcast_to(x0, (h, w))
    y0 = jnp.broadcast_to(y0, (h, w))
    dist0 = jnp.sqrt(x0 * x0 + y0 * y0)
    n_steps = int(FINAL_TIME / TIME_STEP)
    param = jnp.asarray(param, f32)
    sysv = jnp.asarray(sys, jnp.int32)

    def body(_, s):
        x, y = s
        dx = TIME_STEP * y
        dy = TIME_STEP * _rhs(x, y, param, sysv)
        return (x + dx, y + dy)

    x, y = lax.fori_loop(0, n_steps, body, (x0, y0))
    distf = jnp.sqrt(x * x + y * y)
    dist_r = distf / jnp.maximum(dist0, 1e-12)
    red = jnp.clip(dist_r * 255.0, 0, 255).astype(jnp.uint8)
    blue = jnp.clip((1.0 / jnp.maximum(dist_r, 1e-12)) * 255.0, 0, 255).astype(jnp.uint8)
    axes = ((jnp.arange(w)[None, :] == w // 2) | (jnp.arange(h)[:, None] == h // 2))
    green = jnp.where(axes, 255, 0).astype(jnp.uint8)
    a = jnp.full((h, w), 255, jnp.uint8)
    return jnp.stack([red, green, blue, a], axis=-1)
