"""Preset scenes mirroring the reference's bundled setups and the BASELINE
benchmark configs.

Ref: Serial/lumina.cpp:292-386 (serial app scene), Parellel/main.cu:140-244
(CUDA app scene), plus the commented-out sphere/plane/cylinder scene
(Serial/lumina.cpp:312-360) which BASELINE config 1 resurrects.
"""
from __future__ import annotations

from pathlib import Path

import jax.numpy as jnp

from realtrace_tpu.core.types import Scene, SceneBuilder
from realtrace_tpu.io.obj import load_obj_scene
from realtrace_tpu.render.camera import Camera

REFERENCE_ASSETS = Path("/root/reference/Serial")


def asset(name: str) -> Path:
    return REFERENCE_ASSETS / name


def sphere_plane_scene(dtype=jnp.float32) -> tuple[Scene, dict]:
    """BASELINE config 1: sphere + floor quad + point light.

    Parameters from the commented-out serial scene (Serial/lumina.cpp:323-357):
    red sphere at (4,0,4) r=3, grey reflective floor at y=-3.
    """
    b = SceneBuilder(dtype=dtype)
    b.ambient = (1.0, 1.0, 1.0)
    b.background = (0.1, 0.3, 0.6)
    b.add_sphere((4.0, 0.0, 4.0), 3.0, color=(0.8, 0.1, 0.0),
                 material=b.material(ka=0.2, kd=0.9, ks=0.4, kr=0.0, kt=0.0, eta=1.0))
    b.add_plane((10, -3, 10), (-10, -3, 10), (-10, -3, -10), (10, -3, -10),
                color=(0.5, 0.5, 0.5),
                material=b.material(ka=0.1, kd=0.9, ks=0.2, kr=0.5, kt=0.0, eta=1.0))
    b.add_light((0, 30, 30), (0.5, 1.0, 1.0))
    cam = dict(position=(60, 60, 0), target=(0, 0, 0), up=(0, 1, 0), fovy=45.0)
    return b.build(), cam


def full_primitive_scene(dtype=jnp.float32) -> tuple[Scene, dict]:
    """All four primitive families incl. a dielectric cylinder — the complete
    commented-out serial scene (Serial/lumina.cpp:312-357)."""
    b = SceneBuilder(dtype=dtype)
    b.ambient = (1.0, 1.0, 1.0)
    b.background = (0.1, 0.3, 0.6)
    b.add_sphere((4, 0, 4), 3.0, color=(0.8, 0.1, 0.0),
                 material=b.material(ka=0.2, kd=0.9, ks=0.4, kr=0.0, kt=0.0, eta=1.0))
    b.add_cylinder((-7, 0, -3), (0, 0, 1), 1.0, color=(1.0, 1.0, 1.0),
                   material=b.material(ka=0.4, kd=0.9, ks=0.4, kr=0.1, kt=0.8, eta=2.0))
    b.add_plane((10, -3, 10), (-10, -3, 10), (-10, -3, -10), (10, -3, -10),
                color=(0.5, 0.5, 0.5),
                material=b.material(ka=0.1, kd=0.9, ks=0.2, kr=0.5, kt=0.0, eta=1.0))
    b.add_triangle((3, 3, 0), (3, -3, 0), (0, 0, 0),
                   vertex_colors=((1, 0, 0), (1, 1, 0), (0, 0, 1)),
                   material=b.material())
    b.add_light((0, 30, 30), (0.5, 1.0, 1.0))
    cam = dict(position=(60, 60, 0), target=(0, 0, 0), up=(0, 1, 0), fovy=45.0)
    return b.build(), cam


def serial_obj_scene(obj_path=None, texture_path=None, dtype=jnp.float32,
                     scale: float = 15.0, max_faces: int | None = None,
                     texture_scale: float = 1.0) -> tuple[Scene, dict]:
    """The serial app's shipped scene (Serial/lumina.cpp:292-386): camera at
    (60,60,0) fovy 45, ambient 1, background (0.1,0.3,0.6), light at (0,30,30)
    with intensity (0.5,1,1), OBJ scaled x15 with reflective OBJ material.

    Default object: bob_tri.obj (+ texture when given). The serial app caps at
    2000 triangles; pass ``max_faces=2000`` for strict parity.
    """
    obj_path = obj_path or asset("bob_tri.obj")
    b = SceneBuilder(dtype=dtype)
    b.ambient = (1.0, 1.0, 1.0)
    b.background = (0.1, 0.3, 0.6)
    b.add_light((0, 30, 30), (0.5, 1.0, 1.0))
    load_obj_scene(b, obj_path, texture_path=texture_path, scale=scale,
                   max_faces=max_faces, texture_scale=texture_scale)
    cam = dict(position=(60, 60, 0), target=(0, 0, 0), up=(0, 1, 0), fovy=45.0)
    return b.build(), cam


def parallel_obj_scene(obj_path=None, dtype=jnp.float32, scale: float = 2.0,
                       max_faces: int | None = None) -> tuple[Scene, dict]:
    """The CUDA app's scene (Parellel/main.cu:140-244): model duplicated at
    x±5, two floor triangles, camera (60,0,60) with up (0,-1,0), white light
    at (-10,-10,0). The CUDA path ignores textures (DEFAULT_COLOR on all
    mesh triangles, Parellel/main.cu:24,171)."""
    obj_path = obj_path or asset("bob_tri.obj")
    b = SceneBuilder(dtype=dtype)
    # CUDA AMBIENT_COLOR is the miss color (Parellel/kernel.cu:13)
    b.ambient = (1.0, 1.0, 1.0)
    b.background = (0.235294, 0.67451, 0.843137)
    load_obj_scene(b, obj_path, scale=scale, max_faces=max_faces,
                   default_color=(0.5, 0.5, 0.5),
                   material=SceneBuilder.material(ka=0.4, kd=0.8, ks=0.1, kr=0.0, kt=0.0),
                   duplicate_offset=(5.0, 0.0, 0.0))
    # floor: two big reflective triangles at y=-7 (Parellel/main.cu:200-213)
    floor_mat = SceneBuilder.material(ka=0.4, kd=0.8, ks=0.1, kr=0.001, kt=0.0)
    b.add_triangle((-30, -7, -30), (30, -7, -30), (30, -7, 30),
                   color=(0.3, 0.3, 0.3), material=floor_mat)
    b.add_triangle((-30, -7, -30), (30, -7, 30), (-30, -7, 30),
                   color=(0.3, 0.3, 0.3), material=floor_mat)
    b.add_light((-10, -10, 0), (1.0, 1.0, 1.0))
    cam = dict(position=(60, 0, 60), target=(0, 0, 0), up=(0, -1, 0), fovy=45.0)
    return b.build(), cam


def duplicated_serial_scene(n_copies: int, dtype=jnp.float32,
                            texture_path=None) -> tuple[Scene, dict]:
    """bob duplicated on an x/z offset grid — the big-scene workload.

    Generalizes the CUDA app's model duplication at x±5
    (Parellel/main.cu:167-181) to n copies, used to push the triangle count
    past the VMEM-resident limit (streaming-kernel benchmarks)."""
    import numpy as np
    import jax.tree_util as jtu

    scene, cam = serial_obj_scene(texture_path=texture_path, dtype=dtype)
    tv = np.asarray(scene.tri_vertices)
    tc = np.asarray(scene.tri_colors)
    # first six offsets are frozen (round 2-4 captures used exactly these);
    # beyond 6, walk an expanding x/z grid ring by ring (spacing 18)
    offs = [(0.0, 0.0), (18.0, 0.0), (0.0, 18.0), (18.0, 18.0),
            (-18.0, 0.0), (0.0, -18.0)]
    ring = 1
    while len(offs) < n_copies:
        s = 18.0 * ring
        cand = [(i * 18.0, j * 18.0)
                for i in range(-ring, ring + 1)
                for j in range(-ring, ring + 1)
                if max(abs(i), abs(j)) == ring]
        offs.extend(c for c in cand if c not in offs)
        ring += 1
    offs = offs[:n_copies]
    tvs, tcs = [], []
    for ox, oz in offs:
        t = tv.copy()
        t[..., 0] += ox
        t[..., 2] += oz
        tvs.append(t)
        tcs.append(tc)
    mats = jtu.tree_map(lambda x: jnp.concatenate([x] * n_copies),
                        scene.tri_materials)
    scene = scene.replace(tri_vertices=jnp.asarray(np.concatenate(tvs)),
                          tri_colors=jnp.asarray(np.concatenate(tcs)),
                          tri_materials=mats)
    return scene, cam


def glass_bob_scene(texture_path=None, dtype=jnp.float32) -> tuple[Scene, dict]:
    """Serial bob scene + one dielectric sphere between camera and model.

    The branching-wavefront benchmark scene: every primary hit on the sphere
    takes the Fresnel split (reflect AND refract children both live — the
    reference's dielectric semantics, Serial/world.cpp:77-100)."""
    from realtrace_tpu.core.types import Materials

    scene, cam = serial_obj_scene(texture_path=texture_path, dtype=dtype)
    f32 = jnp.float32
    sph_m = Materials(ka=jnp.asarray([0.1], f32), kd=jnp.asarray([0.2], f32),
                      ks=jnp.asarray([0.3], f32), kr=jnp.asarray([0.3], f32),
                      kt=jnp.asarray([0.8], f32), eta=jnp.asarray([1.5], f32))
    scene = scene.replace(
        sph_center=jnp.asarray([[20.0, 15.0, 20.0]], f32),
        sph_radius=jnp.asarray([10.0], f32),
        sph_color=jnp.asarray([[0.95, 0.95, 1.0]], f32),
        sph_materials=sph_m,
        dielectric=True)
    return scene, cam


def make_camera(cam: dict, width: int, height: int, dtype=jnp.float32) -> Camera:
    return Camera.make(cam["position"], cam["target"], cam["up"], cam["fovy"],
                       width, height, dtype=dtype)
