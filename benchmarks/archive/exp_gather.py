"""Throwaway experiment: TPU row-gather cost vs formulation.

Every repeat uses a UNIQUE input buffer — the axon remote runtime appears to
memoize identical (executable, args) executions, which silently turns
repeat-timing into dispatch-timing. Reports implied HBM GB/s as a sanity
check against the chip's ~819 GB/s ceiling.
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

R, N = 2_073_600, 10_752
REPS = 8


def timeit(name, fn, argsets, bytes_moved=None):
    jax.block_until_ready(fn(*argsets[0]))
    t0 = time.perf_counter()
    for i in range(1, REPS + 1):
        out = fn(*argsets[i])
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / REPS
    bw = f"  ({bytes_moved/dt/1e9:7.0f} GB/s)" if bytes_moved else ""
    print(f"{name:40s} {dt*1e3:8.2f} ms{bw}")


def main():
    rng = np.random.default_rng(0)
    idxs = [jnp.asarray(rng.integers(0, N, size=R), jnp.int32) for _ in range(REPS + 1)]
    for k in (25, 32):
        table = jnp.asarray(rng.standard_normal((N, k)), jnp.float32)
        f = jax.jit(lambda t, i: t[i])
        timeit(f"table[(N,{k})][idx]", f, [(table, i) for i in idxs],
               bytes_moved=R * k * 4 * 2)
    bigs = [jnp.asarray(rng.standard_normal((R, 25)), jnp.float32) for _ in range(REPS + 1)]
    timeit("copy floor (R,25)*1.0001", jax.jit(lambda x: x * 1.0001),
           [(b,) for b in bigs], bytes_moved=R * 25 * 4 * 2)

    table = jnp.asarray(rng.standard_normal((N, 25)), jnp.float32)

    def attrs(t, i, ro, rd):
        g = t[i]
        tv = g[:, 0:9].reshape(-1, 3, 3)
        a, b, c = tv[:, 0], tv[:, 1], tv[:, 2]
        e1, e2 = a - b, a - c
        nrm = jnp.cross(e1, e2)
        det = jnp.sum(rd * nrm, -1)
        s = a - ro
        tt = jnp.sum(s * nrm, -1) / jnp.where(jnp.abs(det) > 0, det, 1.0)
        return tt, nrm, g[:, 9:18]

    ro = jnp.asarray(rng.standard_normal((R, 3)), jnp.float32)
    rd = jnp.asarray(rng.standard_normal((R, 3)), jnp.float32)
    timeit("gather + tri attr arithmetic", jax.jit(attrs),
           [(table, i, ro, rd) for i in idxs])


if __name__ == "__main__":
    main()
