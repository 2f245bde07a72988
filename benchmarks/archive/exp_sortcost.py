"""Throwaway: cost of argsort + (N,3) permutation gathers at wavefront widths
(the reorder_secondary machinery) on TPU."""
from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

L = 4


def timeit(name, fn, *args):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(3):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:46s} {(time.perf_counter()-t0)/3/L*1e3:8.3f} ms/call")


def chain(body, seed_shape):
    def f(key, x):
        acc = jnp.zeros((), jnp.float32)
        k = key
        for _ in range(L):
            s = body(k, x)
            acc = acc + s
            k = key ^ (acc * 1e-20).astype(key.dtype)  # dependency
        return acc
    return jax.jit(f)


def main():
    rng = np.random.default_rng(0)
    for n in (65_536, 131_072, 524_288):
        key = jnp.asarray(rng.integers(0, 2**30, n), jnp.uint32)
        x3 = jnp.asarray(rng.standard_normal((n, 3)), jnp.float32)

        def argsort_only(k, x):
            o = jnp.argsort(k)
            return jnp.sum(o.astype(jnp.float32)) * 1e-20

        timeit(f"argsort uint32 n={n}", chain(argsort_only, None), key, x3)

        def sort_gather(k, x):
            o = jnp.argsort(k).astype(jnp.int32)
            inv = jnp.zeros_like(o).at[o].set(jnp.arange(n, dtype=jnp.int32))
            g = x[o]
            h = (g * 1.0001)[inv]
            return jnp.sum(h) * 1e-20

        timeit(f"argsort + inv + 2x (n,3) gathers n={n}", chain(sort_gather, None), key, x3)

        def gathers_only(k, x):
            o = (k % n).astype(jnp.int32)
            g = x[o]
            return jnp.sum(g) * 1e-20

        timeit(f"one (n,3) random gather n={n}", chain(gathers_only, None), key, x3)


if __name__ == "__main__":
    main()
