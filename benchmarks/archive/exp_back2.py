"""Throwaway experiment: cost of returning compacted level results to full
width, and candidate replacements.

Shapes mirror the 1080p bob frame: nt=2040 tiles x 1024 lanes, cap=128.
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

N = 20


def timeit(name, fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(N):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:55s} {(time.perf_counter()-t0)/N*1e3:8.2f} ms", flush=True)
    return out


def main():
    nt, tile, cap = 2040, 1024, 128
    r = nt * tile
    key = jax.random.PRNGKey(0)
    rng = np.random.default_rng(0)
    live_tiles = np.zeros(nt, bool)
    live_tiles[rng.choice(nt, cap - 20, replace=False)] = True
    tl = jnp.asarray(live_tiles)
    pos = jnp.cumsum(tl.astype(jnp.int32)) - 1
    posc = jnp.clip(pos, 0, cap - 1)
    tidx = jnp.nonzero(tl, size=cap, fill_value=0)[0].astype(jnp.int32)

    xc = jax.random.normal(key, (cap * tile, 3), jnp.float32)
    accum = jnp.zeros((r, 3), jnp.float32)

    def back1(xc):
        xt = xc.reshape(cap, tile, 3)[posc]
        return jnp.where(tl[:, None, None], xt, 0.0).reshape(r, 3)

    def back4(xc):
        return [back1(xc) for _ in range(4)]

    def back_fused(xc12):
        xt = xc12.reshape(cap, tile, 12)[posc]
        out = jnp.where(tl[:, None, None], xt, 0.0).reshape(r, 12)
        return out[:, 0:3], out[:, 3:6], out[:, 6:9], out[:, 9:12]

    def scatter_add(accum, xc):
        return accum.at[tidx].add(xc.reshape(cap, tile, 3),
                                  unique_indices=True, mode="drop")

    def dus(accum, xc):
        # keep-compact strategy cost model: one dynamic_update_slice per array
        return jax.lax.dynamic_update_slice(accum, xc, (0, 0))

    xc12 = jax.random.normal(key, (cap * tile, 12), jnp.float32)
    accum_t = jnp.zeros((nt, tile, 3), jnp.float32)

    timeit("back() x1 (gather+where, (nt,1024,3))", jax.jit(back1), xc)
    timeit("back() x4 (current per-level cost)", jax.jit(back4), xc)
    timeit("back fused 12-col x1", jax.jit(back_fused), xc12)
    timeit("scatter-add contrib .at[tidx].add", jax.jit(scatter_add), accum_t, xc)
    timeit("dynamic_update_slice into full buf", jax.jit(dus), accum, xc)

    # gather side (level entry): current g3 x3
    full = jax.random.normal(key, (r, 3), jnp.float32)

    def g3(x):
        return x.reshape(nt, tile, 3)[tidx].reshape(cap * tile, 3)

    timeit("g3 gather x3 (level entry)", jax.jit(lambda x: [g3(x) for _ in range(3)]), full)

    # argsort reorder at cap width
    keyv = jax.random.randint(key, (cap * tile,), 0, 1 << 30, jnp.int32).astype(jnp.uint32)
    timeit("argsort u32 (cap*1024)", jax.jit(lambda k: jnp.argsort(k)), keyv)
    keyf = jax.random.randint(key, (r,), 0, 1 << 30, jnp.int32).astype(jnp.uint32)
    timeit("argsort u32 (full 2M)", jax.jit(lambda k: jnp.argsort(k)), keyf)

    # full-width live/tl bookkeeping per scan step
    coeff_f = jax.random.normal(key, (r, 3), jnp.float32)

    def book(coeff_f):
        live = jnp.any(coeff_f > 0.0, axis=-1)
        tl = jnp.any(live.reshape(nt, tile), axis=1)
        cnt = jnp.sum(tl, dtype=jnp.int32)
        pos = jnp.cumsum(tl.astype(jnp.int32)) - 1
        return tl, cnt, pos
    timeit("full-width live/tile bookkeeping", jax.jit(book), coeff_f)


if __name__ == "__main__":
    main()
