"""Throwaway experiment: (R,3) vector math vs component-wise (R,) arrays.

Hypothesis: minor-dim-3 arrays are lane-padded 3->128 on TPU, so every
materialized (R,3) intermediate costs ~42x its logical bytes. The triangle
attribute recompute is re-expressed with x/y/z component arrays and timed
against the (R,3) formulation (dependent chaining defeats overlap).
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

R = 2_088_960
L = 4


def timeit(name, fn, *args):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(3):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:44s} {(time.perf_counter()-t0)/3/L*1e3:8.2f} ms/call")


def attr_rows(g, ro, rd):
    tv = g[:, 0:9].reshape(-1, 3, 3)
    tc = g[:, 9:18].reshape(-1, 3, 3)
    a, b, c = tv[:, 0], tv[:, 1], tv[:, 2]
    e1, e2 = a - b, a - c
    nrm = jnp.cross(e1, e2)
    det = jnp.sum(rd * nrm, -1)
    det_safe = jnp.where(jnp.abs(det) > 0, det, 1.0)
    s = a - ro
    tt = jnp.sum(s * nrm, -1) / det_safe
    beta = jnp.sum(rd * jnp.cross(s, e2), -1) / det_safe
    gamma = jnp.sum(rd * jnp.cross(e1, s), -1) / det_safe
    alpha = 1.0 - beta - gamma
    col = alpha[:, None] * tc[:, 0] + beta[:, None] * tc[:, 1] + gamma[:, None] * tc[:, 2]
    pos = ro + tt[:, None] * rd
    return tt, nrm, col, pos


def attr_cols(gcols, rox, roy, roz, rdx, rdy, rdz):
    # gcols: tuple of 18 (R,) arrays (the gather delivered column-wise)
    ax, ay, az, bx, by, bz, cx, cy, cz = gcols[:9]
    t0x, t0y, t0z, t1x, t1y, t1z = gcols[9:15]
    e1x, e1y, e1z = ax - bx, ay - by, az - bz
    e2x, e2y, e2z = ax - cx, ay - cy, az - cz
    nx = e1y * e2z - e1z * e2y
    ny = e1z * e2x - e1x * e2z
    nz = e1x * e2y - e1y * e2x
    det = rdx * nx + rdy * ny + rdz * nz
    det_safe = jnp.where(jnp.abs(det) > 0, det, 1.0)
    sx, sy, sz = ax - rox, ay - roy, az - roz
    tt = (sx * nx + sy * ny + sz * nz) / det_safe
    c1x = sy * e2z - sz * e2y
    c1y = sz * e2x - sx * e2z
    c1z = sx * e2y - sy * e2x
    beta = (rdx * c1x + rdy * c1y + rdz * c1z) / det_safe
    c2x = e1y * sz - e1z * sy
    c2y = e1z * sx - e1x * sz
    c2z = e1x * sy - e1y * sx
    gamma = (rdx * c2x + rdy * c2y + rdz * c2z) / det_safe
    alpha = 1.0 - beta - gamma
    colx = alpha * t0x + beta * t1x + gamma * gcols[15]
    coly = alpha * t0y + beta * t1y + gamma * gcols[16]
    colz = alpha * t0z + beta * t1z + gamma * gcols[17]
    posx = rox + tt * rdx
    return tt, nx, ny, nz, colx, coly, colz, posx


def main():
    rng = np.random.default_rng(0)
    g = jnp.asarray(rng.standard_normal((R, 25)), jnp.float32)
    ro = jnp.asarray(rng.standard_normal((R, 3)), jnp.float32)
    rd = jnp.asarray(rng.standard_normal((R, 3)), jnp.float32)

    def chain_rows(g, ro, rd):
        acc = jnp.zeros((), jnp.float32)
        o = ro
        for _ in range(L):
            tt, nrm, col, pos = attr_rows(g, o, rd)
            s = jnp.sum(tt) * 1e-20 + jnp.sum(col) * 1e-20 + jnp.sum(pos) * 1e-20
            acc = acc + s
            o = ro + s
        return acc

    timeit("attr math, (R,3) rows", jax.jit(chain_rows), g, ro, rd)

    gcols = tuple(jnp.asarray(rng.standard_normal((R,)), jnp.float32) for _ in range(18))
    cols = tuple(jnp.asarray(rng.standard_normal((R,)), jnp.float32) for _ in range(6))

    def chain_cols(gcols, cols):
        rox, roy, roz, rdx, rdy, rdz = cols
        acc = jnp.zeros((), jnp.float32)
        ox = rox
        for _ in range(L):
            outs = attr_cols(gcols, ox, roy, roz, rdx, rdy, rdz)
            s = sum(jnp.sum(o) for o in outs) * 1e-20
            acc = acc + s
            ox = rox + s
        return acc

    timeit("attr math, component (R,) arrays", jax.jit(chain_cols), gcols, cols)

    # how expensive is the (R,3) <-> components boundary?
    def split_join(ro, rd):
        acc = jnp.zeros((), jnp.float32)
        o = ro
        for _ in range(L):
            x, y, z = o[:, 0], o[:, 1], o[:, 2]
            w = x * y + z
            s = jnp.sum(w) * 1e-20
            acc = acc + s
            o = ro + s
        return acc

    timeit("split (R,3)->3x(R,) + tiny math", jax.jit(split_join), ro, rd)


if __name__ == "__main__":
    main()
