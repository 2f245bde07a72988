"""Multi-chip / multi-host parallelism: pixel-tile sharding over a device mesh.

The reference is a single-GPU program (SURVEY §2.4); its parallelism story is
1-thread-per-pixel. The TPU-native scaling axes (north star): shard *pixel
tiles* over a 2-D device mesh (the renderer's data axis), replicate the scene
per device, and psum scene-parameter gradients over ICI — expressed with
``shard_map`` so the collectives are explicit.

Forward render is embarrassingly parallel (no collectives); the inverse-render
training step all-reduces scene grads, which XLA overlaps with the backward
bounce loop where profitable.
"""
from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax import Array, lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from realtrace_tpu.core.types import RenderConfig, Scene
from realtrace_tpu.diff.inverse import DIFF_FIELDS, apply_params, scene_params
from realtrace_tpu.render.camera import Camera
from realtrace_tpu.render.shade import trace_wavefront

AXES = ("ty", "tx")  # tile-rows x tile-cols over the image plane


def make_mesh(n_devices: int | None = None, shape: tuple[int, int] | None = None,
              devices: Sequence | None = None) -> Mesh:
    """Build a 2-D ('ty','tx') mesh over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = n_devices or len(devices)
    devices = devices[:n]
    if shape is None:
        ty = 1
        for f in range(int(np.sqrt(n)), 0, -1):
            if n % f == 0:
                ty = f
                break
        shape = (ty, n // ty)
    assert shape[0] * shape[1] == n, (shape, n)
    return Mesh(np.asarray(devices).reshape(shape), AXES)


def _tile_dims(camera: Camera, mesh: Mesh) -> tuple[int, int]:
    ty, tx = mesh.shape[AXES[0]], mesh.shape[AXES[1]]
    if camera.height % ty or camera.width % tx:
        raise ValueError(f"image {camera.height}x{camera.width} not divisible by mesh {ty}x{tx}")
    return camera.height // ty, camera.width // tx


def _local_buffer(scene: Scene, camera: Camera, cfg: RenderConfig,
                  branching: bool, tile_h: int, tile_w: int) -> Array:
    """Render this device's pixel tile: (tile_h, tile_w, 3) in buffer (bottom
    -up row) orientation. Runs inside shard_map."""
    iy = lax.axis_index(AXES[0])
    ix = lax.axis_index(AXES[1])
    j0 = (iy * tile_h).astype(scene.dtype)
    i0 = (ix * tile_w).astype(scene.dtype)
    rd = camera.ray_directions_tile(i0, j0, tile_w, tile_h)
    ro = jnp.broadcast_to(camera.position, rd.shape)

    buf = trace_wavefront(scene, ro, rd, cfg, branching=branching)
    return buf.reshape(tile_h, tile_w, 3)


def sharded_render(scene: Scene, camera: Camera, cfg: RenderConfig, mesh: Mesh,
                   branching: bool | None = None) -> Array:
    """Full-frame render with pixel tiles sharded over the mesh.

    Returns the top-down (H, W, 3) clamped image (a global sharded array).
    """
    if branching is None:
        branching = scene.has_dielectrics()
    th, tw = _tile_dims(camera, mesh)

    @functools.partial(shard_map, mesh=mesh,
                       in_specs=(P(), P()), out_specs=P(*AXES, None),
                       check_vma=False)
    def run(scene, camera):
        return _local_buffer(scene, camera, cfg, branching, th, tw)

    buf = run(scene, camera)              # (H, W, 3) buffer-oriented
    return jnp.clip(buf[::-1], 0.0, 1.0)


def make_sharded_train_step(scene: Scene, camera: Camera, cfg: RenderConfig,
                            target_image: Array, mesh: Mesh,
                            optimizer: optax.GradientTransformation | None = None,
                            fields=DIFF_FIELDS, resort_chunks: bool | None = None):
    """Sharded inverse-rendering step: per-device tile render + local grad,
    explicit ``psum`` of scene-parameter grads over the mesh, replicated
    optimizer update.

    ``target_image`` is the top-down (H, W, 3) goal; it is resharded to tiles
    internally. Returns (jitted_step, params0, opt_state0). ``resort_chunks``
    rebuilds the accel chunk ordering on device from the current vertex params
    (default: on exactly when vertices are optimized with a chunked accel);
    the rebuild is deterministic on replicated inputs, so every device
    computes the identical ordering with no extra collective.
    """
    branching = scene.has_dielectrics()
    optimizer = optimizer or optax.adam(1e-2)
    th, tw = _tile_dims(camera, mesh)
    denom = float(camera.height * camera.width * 3)
    target_buf = jnp.asarray(target_image)[::-1]      # buffer orientation
    if resort_chunks is None:
        resort_chunks = "tri_vertices" in fields and cfg.accel != "bruteforce"

    params0 = scene_params(scene, fields)
    opt_state0 = optimizer.init(params0)

    @functools.partial(shard_map, mesh=mesh,
                       in_specs=(P(), P(*AXES, None), P(), P()),
                       out_specs=(P(), P()),
                       check_vma=False)
    def loss_and_grad(params, tgt_tile, scene, camera):
        def local_loss(p):
            s = apply_params(scene, p)
            if resort_chunks and s.n_triangles and s.tri_chunk_perm is not None:
                from realtrace_tpu.ops import accel
                s = accel.resort_chunks(s, cfg)
            buf = _local_buffer(s, camera, cfg, branching, th, tw)
            return jnp.sum((buf - tgt_tile) ** 2) / denom

        loss, grads = jax.value_and_grad(local_loss)(params)
        # the gradient all-reduce over ICI (north-star requirement)
        grads = lax.psum(grads, AXES)
        loss = lax.psum(loss, AXES)
        return loss, grads

    @jax.jit
    def step(params, opt_state):
        loss, grads = loss_and_grad(params, target_buf, scene, camera)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    # direct (params) -> (loss, grads) export so equivalence tests can read
    # the psum'd gradients without reverse-engineering them from an sgd step
    step.loss_and_grad = jax.jit(
        lambda params: loss_and_grad(params, target_buf, scene, camera))
    return step, params0, opt_state0


def replicate_scene(scene: Scene, mesh: Mesh) -> Scene:
    """Place every scene leaf replicated over the mesh (the analog of the
    one-time cudaMemcpy scene upload, Parellel/main.cu:228-241)."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), scene)


def init_distributed(coordinator: str | None = None, num_processes: int | None = None,
                     process_id: int | None = None) -> None:
    """Multi-host bring-up wrapper (jax.distributed.initialize). On a pod
    slice with TPU metadata available the arguments are auto-detected."""
    kwargs = {}
    if coordinator is not None:
        kwargs = dict(coordinator_address=coordinator,
                      num_processes=num_processes, process_id=process_id)
    jax.distributed.initialize(**kwargs)
