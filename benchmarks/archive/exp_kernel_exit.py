"""Throwaway: can Mosaic compile a while_loop whose condition reduces a
vector carry to a scalar? Gate for the sorted-entry early-exit sweep."""
from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def kernel(entry_ref, x_ref, out_ref, n_ref):
    x = x_ref[:]                                  # (1, 1024)

    def cond(carry):
        j, best = carry
        e = entry_ref[0, j]                       # SMEM scalar
        return (j < 8) & ~jnp.all(best < e)

    def body(carry):
        j, best = carry
        e = entry_ref[0, j]
        best = jnp.minimum(best, x + e)
        return j + 1, best

    j, best = lax.while_loop(cond, body, (jnp.asarray(0, jnp.int32),
                                          jnp.full((1, 1024), 1e30, jnp.float32)))
    out_ref[0, :] = best[0, :]
    n_ref[0, 0] = j


def main():
    entries = jnp.asarray(np.arange(8, dtype=np.float32)[None] * 10.0)  # (1,8)
    x = jnp.asarray(np.random.default_rng(0).uniform(0, 5, (1, 1024)), jnp.float32)
    out, n = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec((1, 1024), lambda: (0, 0))],
        out_specs=[pl.BlockSpec((1, 1024), lambda: (0, 0)),
                   pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_shape=[jax.ShapeDtypeStruct((1, 1024), jnp.float32),
                   jax.ShapeDtypeStruct((1, 1), jnp.int32)],
    )(entries, x)
    print("iterations run:", int(n[0, 0]), "(expect 2: after j=1, best<e=20 for all)")
    print("best range:", float(out.min()), float(out.max()))


if __name__ == "__main__":
    main()
