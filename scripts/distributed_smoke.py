"""Two-process ``jax.distributed`` smoke test: the multi-host (DCN) code path.

Real pods are not available in this environment, so this exercises the
process-spanning structure on the CPU backend: 2 OS processes x 4 virtual
devices each, ``jax.distributed.initialize`` against a localhost coordinator,
a (2, 4) mesh whose 'ty' axis crosses the process boundary, and one sharded
inverse-rendering step whose gradient ``psum`` therefore rides the
cross-process collective — the structural analog of a 2-host TPU pod slice
(north-star scaling row, BASELINE.md).

Launcher mode (default): computes the single-process reference loss/grads,
spawns the two workers, and checks the distributed result matches.

    python scripts/distributed_smoke.py            # full smoke, prints OK
    python scripts/distributed_smoke.py worker <i> <ref.npz> <port>
"""
from __future__ import annotations

import os
import subprocess
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

WIDTH, HEIGHT = 32, 16
N_TRIS = 48
SEED = 12


def _force_cpu(n_local: int) -> None:
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + f" --xla_force_host_platform_device_count={n_local}")
    import jax
    jax.config.update("jax_platforms", "cpu")


def _build_problem():
    """Deterministic scene/camera/target — identical in every process."""
    import jax.numpy as jnp
    import numpy as np

    from realtrace_tpu.core.types import RenderConfig, SceneBuilder
    from realtrace_tpu.render.camera import Camera

    rng = np.random.default_rng(SEED)
    b = SceneBuilder(dtype=jnp.float32)
    b.ambient = (1.0, 1.0, 1.0)
    b.background = (0.1, 0.3, 0.6)
    for ctr in rng.uniform(-8, 8, (N_TRIS, 3)):
        tri = ctr + rng.uniform(-1.5, 1.5, (3, 3))
        b.add_triangle(tri[0], tri[1], tri[2], color=tuple(rng.uniform(0, 1, 3)),
                       material=b.material(kr=0.2))
    b.add_light((0, 30, 30), (0.6, 1.0, 1.0))
    scene = b.build()
    camera = Camera.make((0, 5, 30), (0, 0, 0), (0, 1, 0), 45.0, WIDTH, HEIGHT,
                         dtype=jnp.float32)
    cfg = RenderConfig(max_depth=1, accel="bruteforce")
    target = jnp.zeros((HEIGHT, WIDTH, 3), jnp.float32)
    return scene, camera, cfg, target


def _flat_grads(grads) -> "np.ndarray":
    import jax
    import numpy as np
    return np.concatenate([np.asarray(g).ravel()
                           for g in jax.tree_util.tree_leaves(grads)])


def run_reference(out_path: str) -> None:
    """Single-process, single-device step (the truth): loss + updated params."""
    _force_cpu(1)
    import numpy as np

    from realtrace_tpu.diff.inverse import make_train_step

    scene, camera, cfg, target = _build_problem()
    step, params, opt_state = make_train_step(scene, camera, cfg, target)
    params1, _, loss = step(params, opt_state)
    np.savez(out_path, loss=np.asarray(loss), params1=_flat_grads(params1))
    print(f"[reference] loss {float(loss):.6e}", flush=True)


def run_worker(process_id: int, ref_path: str, port: int) -> None:
    _force_cpu(4)
    import jax

    jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                               num_processes=2, process_id=process_id)
    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 8 and jax.local_device_count() == 4

    import numpy as np
    from jax.sharding import Mesh

    from realtrace_tpu.parallel.mesh import AXES, make_sharded_train_step

    scene, camera, cfg, target = _build_problem()
    # (2, 4): 'ty' axis = the process boundary -> grad psum crosses processes
    mesh = Mesh(np.asarray(jax.devices()).reshape(2, 4), AXES)
    step, params, opt_state = make_sharded_train_step(scene, camera, cfg,
                                                      target, mesh)
    params1, _, loss = step(params, opt_state)
    loss = float(loss)
    print(f"[worker {process_id}] sharded loss {loss:.6e}", flush=True)

    ref = np.load(ref_path)
    np.testing.assert_allclose(loss, float(ref["loss"]), rtol=1e-5)
    # post-step params are replicated (grads were psum'd over the
    # process-spanning mesh); equality through the adam update means the
    # cross-process gradient all-reduce produced the single-process grads
    np.testing.assert_allclose(_flat_grads(params1), ref["params1"],
                               rtol=1e-5, atol=1e-7)
    jax.distributed.shutdown()
    print(f"[worker {process_id}] OK", flush=True)


def run_launcher() -> int:
    port = 29871
    with tempfile.TemporaryDirectory() as td:
        ref = str(Path(td) / "ref.npz")
        # reference in a subprocess (its backend init must not leak into ours)
        env = dict(os.environ)
        rc = subprocess.run([sys.executable, __file__, "reference", ref],
                            env=env, timeout=600).returncode
        if rc:
            return rc
        procs = [subprocess.Popen([sys.executable, __file__, "worker", str(i),
                                   ref, str(port)], env=env)
                 for i in range(2)]
        rcs = [p.wait(timeout=600) for p in procs]
        if any(rcs):
            print(f"FAILED: worker rcs {rcs}", flush=True)
            return 1
        print("DISTRIBUTED_SMOKE_OK", flush=True)
        return 0


def main() -> int:
    if len(sys.argv) > 1 and sys.argv[1] == "reference":
        run_reference(sys.argv[2])
        return 0
    if len(sys.argv) > 1 and sys.argv[1] == "worker":
        run_worker(int(sys.argv[2]), sys.argv[3], int(sys.argv[4]))
        return 0
    return run_launcher()


if __name__ == "__main__":
    sys.exit(main())
