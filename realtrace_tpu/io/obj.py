"""Wavefront OBJ loader (the ``v/vn/vt/f`` subset + per-vertex texel sampling).

Ref: ``load_image_from_obj``, Serial/lumina.cpp:195-290 and ``readData``,
Parellel/main.cu:140-244. Output is the dense SoA triangle arrays the TPU
renderer consumes — textures become per-vertex colors sampled at load time
(the ``BarycentricMaterial`` mechanism, Serial/lumina.cpp:248-253).

A native C++ fast path (csrc/objloader.cpp, loaded via ctypes) parses large
OBJ files; the pure-python parser is the always-available fallback and the
semantics reference.
"""
from __future__ import annotations

import dataclasses
from pathlib import Path

import numpy as np

from realtrace_tpu.io.image import load_png


@dataclasses.dataclass
class ObjMesh:
    """Parsed mesh: flat triangle arrays (float64, unscaled-by-jax)."""

    vertices: np.ndarray          # (V, 3) raw vertex positions (already scaled)
    tri_vertex_idx: np.ndarray    # (F, 3) int32 vertex indices per face
    tri_uv_idx: np.ndarray        # (F, 3) int32 texture-vertex indices (-1 = none)
    uvs: np.ndarray               # (T, 2) texture coordinates
    normals: np.ndarray           # (VN, 3) vertex normals (parsed, unused by shading — parity with reference)

    @property
    def triangles(self) -> np.ndarray:
        """(F, 3, 3) vertex positions per face."""
        return self.vertices[self.tri_vertex_idx]

    @property
    def n_faces(self) -> int:
        return self.tri_vertex_idx.shape[0]


def parse_obj(path: str | Path, scale: float = 1.0, max_faces: int | None = None) -> ObjMesh:
    """Parse the v/vn/vt/f subset (``/``-separated face indices, 1-based).

    ``scale`` is the SCALING_FACTOR analog (Serial/lumina.cpp:43 = 15,
    Parellel/main.cu:40 = 2); ``max_faces`` the serial 2000-triangle cap
    (Serial/lumina.cpp:266) — both promoted to arguments.

    Note: the reference indexes ``texture_vertices[idx[i][1]]`` without the
    1-based → 0-based correction (Serial/lumina.cpp:248-250, off-by-one); we
    use the correct OBJ convention.
    """
    verts: list[list[float]] = []
    norms: list[list[float]] = []
    uvs: list[list[float]] = []
    faces_v: list[list[int]] = []
    faces_t: list[list[int]] = []
    native = _try_native(path)
    if native is not None:
        verts_a, norms_a, uvs_a, faces_v_a, faces_t_a = native
    else:
        with open(path) as fh:
            for line in fh:
                parts = line.split()
                if not parts:
                    continue
                tag = parts[0]
                if tag == "v":
                    verts.append([float(x) for x in parts[1:4]])
                elif tag == "vn":
                    norms.append([float(x) for x in parts[1:4]])
                elif tag == "vt":
                    uvs.append([float(x) for x in parts[1:3]])
                elif tag == "f":
                    vi, ti = [], []
                    for corner in parts[1:4]:
                        toks = corner.split("/")
                        vi.append(int(toks[0]) - 1)
                        ti.append(int(toks[1]) - 1 if len(toks) > 1 and toks[1] else -1)
                    faces_v.append(vi)
                    faces_t.append(ti)
        verts_a = np.asarray(verts, np.float64).reshape(-1, 3)
        norms_a = np.asarray(norms, np.float64).reshape(-1, 3)
        uvs_a = np.asarray(uvs, np.float64).reshape(-1, 2)
        faces_v_a = np.asarray(faces_v, np.int32).reshape(-1, 3)
        faces_t_a = np.asarray(faces_t, np.int32).reshape(-1, 3)

    if max_faces is not None:
        faces_v_a = faces_v_a[:max_faces]
        faces_t_a = faces_t_a[:max_faces]
    return ObjMesh(vertices=verts_a * scale, tri_vertex_idx=faces_v_a,
                   tri_uv_idx=faces_t_a, uvs=uvs_a, normals=norms_a)


def sample_vertex_colors(mesh: ObjMesh, texture_path: str | Path | None,
                         default_color=(0.8, 0.1, 0.0),
                         texture_scale: float = 1.0) -> np.ndarray:
    """Per-face-vertex colors: nearest-texel samples where UVs exist, else the
    OBJ default material color (init_material_from_obj, Serial/lumina.cpp:163-172).

    Ref sampling: get_value_by_coordinate, Serial/lumina.cpp:175-193 — the
    reference reads raw 0-255 texel bytes into Color (no /255) and transposes
    u/v; we sample normalized [0,1] RGB with the standard OBJ v-up convention.
    ``texture_scale=255.0`` reproduces the raw-byte behavior if needed.
    """
    f = mesh.n_faces
    colors = np.broadcast_to(np.asarray(default_color, np.float64), (f, 3, 3)).copy()
    if texture_path is None:
        return colors
    tex = load_png(texture_path)  # (H, W, 3) in [0,1]
    th, tw, _ = tex.shape
    has_uv = (mesh.tri_uv_idx >= 0).all(axis=1)
    uv_idx = np.clip(mesh.tri_uv_idx, 0, max(len(mesh.uvs) - 1, 0))
    uv = mesh.uvs[uv_idx]                      # (F, 3, 2)
    x = np.clip((uv[..., 0] * tw).astype(np.int64), 0, tw - 1)
    y = np.clip(((1.0 - uv[..., 1]) * th).astype(np.int64), 0, th - 1)
    sampled = tex[y, x] * texture_scale        # (F, 3, 3)
    colors[has_uv] = sampled[has_uv]
    return colors


def _try_native(path):
    """Use the C++ parser when the shared library is built; None → fallback."""
    try:
        from realtrace_tpu.io import native_obj
        return native_obj.parse(path)
    except Exception:
        return None


def load_obj_scene(builder, path: str | Path, texture_path=None, scale: float = 1.0,
                   max_faces: int | None = None, material: dict | None = None,
                   default_color=(0.8, 0.1, 0.0), texture_scale: float = 1.0,
                   duplicate_offset=None) -> "ObjMesh":
    """Load an OBJ into a SceneBuilder with reference OBJ materials.

    ``duplicate_offset``: the CUDA path's model duplication at x±offset
    (Parellel/main.cu:167-181); None disables.
    """
    from realtrace_tpu.core.types import SceneBuilder

    mesh = parse_obj(path, scale=scale, max_faces=max_faces)
    colors = sample_vertex_colors(mesh, texture_path, default_color, texture_scale)
    mat = material or SceneBuilder.material(ka=0.2, kd=0.9, ks=0.4, kr=0.4, kt=0.0, eta=3.0)
    tris = mesh.triangles
    offsets = [np.zeros(3)]
    if duplicate_offset is not None:
        off = np.asarray(duplicate_offset, np.float64)
        offsets = [off, -off]
    for off in offsets:
        for i in range(mesh.n_faces):
            t = tris[i] + off
            builder.add_triangle(t[0], t[1], t[2], vertex_colors=colors[i], material=dict(mat))
    return mesh
