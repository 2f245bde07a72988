"""Checkpoint/resume for inverse-rendering (training) runs.

The reference's nearest analogs are the timestamped PNG framebuffer dump
(Serial/lumina.cpp:424-439) and the progressive render cursor; for the
differentiable-rendering capability this module checkpoints optimizer state +
scene parameters with orbax (SURVEY §5).
"""
from __future__ import annotations

from pathlib import Path
from typing import Any

import jax
import numpy as np

try:
    import orbax.checkpoint as ocp
    _HAVE_ORBAX = True
except Exception:  # pragma: no cover
    _HAVE_ORBAX = False


def save_train_state(directory: str | Path, step: int, params: Any,
                     opt_state: Any) -> Path:
    """Save (step, params, opt_state). Uses orbax when available, otherwise a
    plain npz of flattened leaves (always readable back by this module)."""
    directory = Path(directory)
    directory.mkdir(parents=True, exist_ok=True)
    if _HAVE_ORBAX:
        path = directory / f"step_{step:08d}"
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path.resolve(), {"params": params, "opt_state": opt_state,
                                    "step": np.asarray(step)})
        ckptr.wait_until_finished()
        return path
    leaves, _ = jax.tree_util.tree_flatten((params, opt_state))
    path = directory / f"step_{step:08d}.npz"
    np.savez(path, step=step, **{f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)})
    return path


def restore_train_state(path: str | Path, like_params: Any, like_opt_state: Any):
    """Restore (step, params, opt_state) saved by save_train_state, using the
    given templates for pytree structure."""
    path = Path(path)
    if _HAVE_ORBAX and path.is_dir():
        ckptr = ocp.StandardCheckpointer()
        target = {"params": like_params, "opt_state": like_opt_state,
                  "step": np.asarray(0)}
        got = ckptr.restore(path.resolve(), target)
        return int(got["step"]), got["params"], got["opt_state"]
    d = np.load(path)
    leaves, treedef = jax.tree_util.tree_flatten((like_params, like_opt_state))
    new = [d[f"leaf_{i}"] for i in range(len(leaves))]
    params, opt_state = jax.tree_util.tree_unflatten(treedef, new)
    return int(d["step"]), params, opt_state


def latest_checkpoint(directory: str | Path) -> Path | None:
    directory = Path(directory)
    if not directory.exists():
        return None
    cands = sorted(directory.glob("step_*"))
    return cands[-1] if cands else None
