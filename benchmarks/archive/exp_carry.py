"""Throwaway experiment: cost of (R,3) scan-carry materialization.

A lax.scan carrying 4 x (R,3) arrays with trivial per-level math isolates the
boundary-layout cost (minor-dim-3 lane padding) from real rendering work.
Compared against flat (3R,) carries of identical logical bytes.
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

R = 2_088_960
LEVELS = 4


def timeit(name, fn, *args):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(5):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:44s} {(time.perf_counter()-t0)/5*1e3:8.2f} ms")


def main():
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal((R, 3)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((R, 3)), jnp.float32)

    def scan_r3(a, b):
        def step(c, _):
            ro, rd, coeff, acc = c
            ro2 = ro + rd * 1e-3
            coeff2 = coeff * 0.9
            return (ro2, rd, coeff2, acc + coeff2), None

        init = (a, b, jnp.ones_like(a), jnp.zeros_like(a))
        (ro, rd, coeff, acc), _ = lax.scan(step, init, None, length=LEVELS)
        return acc

    timeit("scan carry 4x(R,3)", jax.jit(scan_r3), a, b)

    af, bf = a.reshape(-1), b.reshape(-1)

    def scan_flat(af, bf):
        def step(c, _):
            ro, rd, coeff, acc = c
            ro2 = ro + rd * 1e-3
            coeff2 = coeff * 0.9
            return (ro2, rd, coeff2, acc + coeff2), None

        init = (af, bf, jnp.ones_like(af), jnp.zeros_like(af))
        (ro, rd, coeff, acc), _ = lax.scan(step, init, None, length=LEVELS)
        return acc

    timeit("scan carry 4x(3R,) flat", jax.jit(scan_flat), af, bf)

    # same but with a tile-gather (the compaction op) inside each level
    def scan_r3_gather(a, b):
        nt = R // 1024

        def step(c, _):
            ro, rd, coeff, acc = c
            tidx = jnp.arange(nt, dtype=jnp.int32)
            ro2 = ro.reshape(nt, 1024, 3)[tidx].reshape(R, 3) + rd * 1e-3
            coeff2 = coeff * 0.9
            return (ro2, rd, coeff2, acc + coeff2), None

        init = (a, b, jnp.ones_like(a), jnp.zeros_like(a))
        (ro, rd, coeff, acc), _ = lax.scan(step, init, None, length=LEVELS)
        return acc

    timeit("scan 4x(R,3) + (nt,1024,3) tile gather", jax.jit(scan_r3_gather), a, b)

    def scan_flat_gather(af, bf):
        nt = R // 1024

        def step(c, _):
            ro, rd, coeff, acc = c
            tidx = jnp.arange(nt, dtype=jnp.int32)
            ro2 = ro.reshape(nt, 3072)[tidx].reshape(-1) + rd * 1e-3
            coeff2 = coeff * 0.9
            return (ro2, rd, coeff2, acc + coeff2), None

        init = (af, bf, jnp.ones_like(af), jnp.zeros_like(af))
        (ro, rd, coeff, acc), _ = lax.scan(step, init, None, length=LEVELS)
        return acc

    timeit("scan flat + (nt,3072) tile gather", jax.jit(scan_flat_gather), af, bf)


if __name__ == "__main__":
    main()
