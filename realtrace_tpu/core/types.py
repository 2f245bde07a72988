"""Scene schema: struct-of-arrays pytrees for the whole renderer.

TPU-native redesign of the reference's object graph (``Serial/world.h``,
``Serial/object.h``): instead of a ``vector<Object*>`` of virtual-dispatch
primitives, every primitive family lives in one dense array batch so
intersection and shading are single fused XLA/Pallas ops over the wavefront.

All dataclasses are JAX pytrees (flax.struct) — they flow through jit / grad /
shard_map. Differentiable leaves: vertices, colors, material scalars, light
params. Counts and flags are static.
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax.numpy as jnp
import numpy as np
from flax import struct
from jax import Array

# Epsilons, faithful to the reference.
SMALLEST_DIST = 1e-4  # min-t cutoff; Serial/ray.h:10
DET_EPSILON = 1e-7    # degenerate-triangle determinant cutoff; Serial/triangle.h:12
RECURSION_DEPTH = 10  # Serial/world.h:11
# Dead wavefront lanes are "parked" at this origin (far outside any scene);
# accel paths recognize the sentinel and assign such lanes zero work.
PARK_DISTANCE = 1e8
# Rays per wavefront tile: the unit of accel-kernel work (ops/pallas/trace
# runs one 8x128-lane grid step per tile) and of inter-level compaction.
WAVEFRONT_TILE = 1024


@struct.dataclass
class Materials:
    """Phong material parameter set, one entry per primitive.

    Ref: ``Material`` fields, Serial/material.h:18-25. ``color`` is carried
    per-primitive elsewhere (triangles use per-vertex colors — the
    ``BarycentricMaterial`` texture mechanism, Serial/material.cpp:10-22).
    """

    ka: Array   # (N,) ambient coefficient
    kd: Array   # (N,) diffuse coefficient
    ks: Array   # (N,) specular coefficient
    kr: Array   # (N,) reflection contribution
    kt: Array   # (N,) refraction contribution
    eta: Array  # (N,) index of refraction

    @staticmethod
    def default(n: int, dtype=jnp.float32) -> "Materials":
        """Reference defaults: Serial/material.h:27-29 (ka .2, kd 1, ks .4)."""
        f = lambda v: jnp.full((n,), v, dtype)
        return Materials(ka=f(0.2), kd=f(1.0), ks=f(0.4), kr=f(0.0), kt=f(0.0), eta=f(128.0))

    @staticmethod
    def obj_default(n: int, dtype=jnp.float32) -> "Materials":
        """Materials the OBJ loader assigns: Serial/lumina.cpp init_material_from_obj."""
        f = lambda v: jnp.full((n,), v, dtype)
        return Materials(ka=f(0.2), kd=f(0.9), ks=f(0.4), kr=f(0.4), kt=f(0.0), eta=f(3.0))


@struct.dataclass
class Lights:
    """Point lights. Ref: Serial/pointlightsource.h:6-14 (single family)."""

    position: Array   # (L, 3)
    intensity: Array  # (L, 3) RGB intensity


@struct.dataclass
class Scene:
    """Full scene as dense SoA arrays; every leaf is differentiable.

    Families mirror the reference primitive set: triangles
    (Serial/triangle.h), spheres (Serial/sphere.h), quads ("Plane",
    Serial/plane.h), infinite cylinders (Serial/cylinder.h). A family may be
    empty (shape (0, ...)); trace paths skip empty families statically.
    """

    # triangles
    tri_vertices: Array       # (Nt, 3, 3) — rows = vertices A,B,C
    tri_colors: Array         # (Nt, 3, 3) — per-vertex RGB (flat color ⇒ repeated)
    tri_materials: Materials  # (Nt,)
    # spheres
    sph_center: Array         # (Ns, 3)
    sph_radius: Array         # (Ns,)
    sph_color: Array          # (Ns, 3)
    sph_materials: Materials  # (Ns,)
    # quads ("planes"); normal derived as cross(p3-p1, p2-p1) (Serial/plane.h:24)
    pln_corners: Array        # (Np, 4, 3)
    pln_color: Array          # (Np, 3)
    pln_materials: Materials  # (Np,)
    # infinite cylinders
    cyl_center: Array         # (Nc, 3)
    cyl_up: Array             # (Nc, 3)
    cyl_radius: Array         # (Nc,)
    cyl_color: Array          # (Nc, 3)
    cyl_materials: Materials  # (Nc,)
    # lighting
    lights: Lights
    ambient: Array            # (3,) — World::setAmbient
    background: Array         # (3,) — World::setBackground
    # acceleration: Morton chunk permutation (topology-only, built by
    # ops.accel.with_chunks — the uniform-grid-build analog, SURVEY §7 step 4)
    tri_chunk_perm: Array | None = None
    # STATIC build-time dielectric flag (pytree aux data, like width/height on
    # Camera): lets ``branching=None`` resolve inside jit without touching
    # concrete leaf values. Set by SceneBuilder.build(); ``replace()`` of a
    # *_materials field CLEARS it back to None unless the caller passes
    # ``dielectric=`` explicitly (see the replace wrapper below the class) —
    # a post-build kt mutation must not silently keep the stale build-time
    # answer. None → fall back to the dynamic host-side inspection.
    dielectric: bool | None = struct.field(pytree_node=False, default=None)

    @property
    def n_triangles(self) -> int:
        return self.tri_vertices.shape[0]

    @property
    def n_spheres(self) -> int:
        return self.sph_center.shape[0]

    @property
    def n_planes(self) -> int:
        return self.pln_corners.shape[0]

    @property
    def n_cylinders(self) -> int:
        return self.cyl_center.shape[0]

    @property
    def dtype(self):
        return self.tri_vertices.dtype

    def has_dielectrics(self) -> bool:
        """Static check used to pick the wavefront branching mode.

        Scenes built through ``SceneBuilder.build()`` carry the answer as
        static aux data (``dielectric``), so this is jit-safe for them — it
        never touches leaf values. For hand-assembled Scenes (flag None) it
        falls back to a host-side inspection of concrete values, which
        raises a TracerArrayConversionError on traced leaves — pass
        ``branching=`` explicitly in that case.
        """
        if self.dielectric is not None:
            return self.dielectric
        mats = [self.tri_materials, self.sph_materials, self.pln_materials, self.cyl_materials]
        for m in mats:
            kr = np.asarray(m.kr)
            kt = np.asarray(m.kt)
            if kr.size and bool(np.any((kr > 0) & (kt > 0))):
                return True
        return False


# ADVICE r4: the static ``dielectric`` flag must not go stale when material
# leaves are swapped post-build (e.g. a test scene raising kt by mutation).
# Wrap the flax-generated ``replace``: any update touching a *_materials field
# clears the flag unless the caller sets it explicitly, so has_dielectrics()
# falls back to the host-side inspection — the true answer on concrete
# scenes, and a loud TracerArrayConversionError under jit (forcing an
# explicit ``branching=`` choice) instead of a silently wrong render.
_scene_struct_replace = Scene.replace


def _scene_replace(self, **updates):
    if ("dielectric" not in updates and self.dielectric is not None
            and any(k.endswith("_materials") for k in updates)):
        updates["dielectric"] = None
    return _scene_struct_replace(self, **updates)


Scene.replace = _scene_replace


def _empty_family(dtype):
    z3 = jnp.zeros((0, 3), dtype)
    return z3


class SceneBuilder:
    """Imperative scene assembly, the analog of ``World::addObject``/``addLight``
    (Serial/world.h:30-38) — collects primitives then freezes into the dense
    SoA ``Scene`` pytree.
    """

    def __init__(self, dtype=jnp.float32):
        self.dtype = dtype
        self._tris: list[tuple[Any, Any, dict]] = []
        self._sphs: list[tuple[Any, float, Any, dict]] = []
        self._plns: list[tuple[Any, Any, dict]] = []
        self._cyls: list[tuple[Any, Any, float, Any, dict]] = []
        self._lights: list[tuple[Any, Any]] = []
        self.ambient = (0.0, 0.0, 0.0)
        self.background = (0.0, 0.0, 0.0)

    # -- materials -------------------------------------------------------
    @staticmethod
    def material(ka=0.2, kd=1.0, ks=0.4, kr=0.0, kt=0.0, eta=128.0, n=128.0) -> dict:
        """Build a material param dict (reference defaults, Serial/material.h:27-29).

        ``n`` is accepted for API parity but the reference hard-codes the Phong
        exponent to 128 in both shaders (Serial/world.cpp:134,
        Parellel/structures.cu:330); the exponent used at render time comes
        from ``RenderConfig.phong_exp``.
        """
        return dict(ka=ka, kd=kd, ks=ks, kr=kr, kt=kt, eta=eta)

    def add_triangle(self, a, b, c, color=(0.8, 0.1, 0.0), vertex_colors=None, material=None):
        m = material or self.material()
        if vertex_colors is None:
            vertex_colors = (color, color, color)
        self._tris.append((np.array([a, b, c], np.float64), np.array(vertex_colors, np.float64), m))

    def add_sphere(self, center, radius, color=(0.8, 0.1, 0.0), material=None):
        self._sphs.append((np.array(center, np.float64), float(radius), np.array(color, np.float64), material or self.material()))

    def add_plane(self, p1, p2, p3, p4, color=(0.5, 0.5, 0.5), material=None):
        self._plns.append((np.array([p1, p2, p3, p4], np.float64), np.array(color, np.float64), material or self.material()))

    def add_cylinder(self, center, up, radius, color=(0.8, 0.1, 0.0), material=None):
        self._cyls.append((np.array(center, np.float64), np.array(up, np.float64), float(radius), np.array(color, np.float64), material or self.material()))

    def add_light(self, position, intensity):
        self._lights.append((np.array(position, np.float64), np.array(intensity, np.float64)))

    # -- freeze ----------------------------------------------------------
    def _mats(self, mats: list[dict]) -> Materials:
        if not mats:
            z = jnp.zeros((0,), self.dtype)
            return Materials(ka=z, kd=z, ks=z, kr=z, kt=z, eta=z)
        cols = {k: jnp.asarray([m[k] for m in mats], self.dtype) for k in ("ka", "kd", "ks", "kr", "kt", "eta")}
        return Materials(**cols)

    def build(self) -> Scene:
        dt = self.dtype
        # concrete at build time (python floats) → record the branching mode
        # statically so has_dielectrics() stays jit-safe downstream
        diel = any(m["kr"] > 0 and m["kt"] > 0 for m in
                   ([t[2] for t in self._tris] + [s[3] for s in self._sphs]
                    + [p[2] for p in self._plns] + [c[4] for c in self._cyls]))
        tv = jnp.asarray(np.array([t[0] for t in self._tris]).reshape(-1, 3, 3), dt)
        tc = jnp.asarray(np.array([t[1] for t in self._tris]).reshape(-1, 3, 3), dt)
        sc = jnp.asarray(np.array([s[0] for s in self._sphs]).reshape(-1, 3), dt)
        sr = jnp.asarray(np.array([s[1] for s in self._sphs]).reshape(-1), dt)
        scol = jnp.asarray(np.array([s[2] for s in self._sphs]).reshape(-1, 3), dt)
        pc = jnp.asarray(np.array([p[0] for p in self._plns]).reshape(-1, 4, 3), dt)
        pcol = jnp.asarray(np.array([p[1] for p in self._plns]).reshape(-1, 3), dt)
        cc = jnp.asarray(np.array([c[0] for c in self._cyls]).reshape(-1, 3), dt)
        cu = jnp.asarray(np.array([c[1] for c in self._cyls]).reshape(-1, 3), dt)
        cr = jnp.asarray(np.array([c[2] for c in self._cyls]).reshape(-1), dt)
        ccol = jnp.asarray(np.array([c[3] for c in self._cyls]).reshape(-1, 3), dt)
        lp = jnp.asarray(np.array([l[0] for l in self._lights]).reshape(-1, 3), dt)
        li = jnp.asarray(np.array([l[1] for l in self._lights]).reshape(-1, 3), dt)
        return Scene(
            tri_vertices=tv, tri_colors=tc, tri_materials=self._mats([t[2] for t in self._tris]),
            sph_center=sc, sph_radius=sr, sph_color=scol, sph_materials=self._mats([s[3] for s in self._sphs]),
            pln_corners=pc, pln_color=pcol, pln_materials=self._mats([p[2] for p in self._plns]),
            cyl_center=cc, cyl_up=cu, cyl_radius=cr, cyl_color=ccol, cyl_materials=self._mats([c[4] for c in self._cyls]),
            lights=Lights(position=lp, intensity=li),
            ambient=jnp.asarray(self.ambient, dt), background=jnp.asarray(self.background, dt),
            dielectric=diel,
        )


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    """Static render hyperparameters — the reference's compile-time macros
    promoted to a config object (SURVEY §5: RECURSION_DEPTH, KR/KT/eta/KA,
    SCALING_FACTOR, shading switches).
    """

    max_depth: int = RECURSION_DEPTH       # Serial/world.h:11
    phong_exp: int = 128                   # hard-coded exponent, Serial/world.cpp:134
    shadows: bool = True
    shadow_blend: float = 1e-4             # finalColor*(1e-4)+shadowColor*(1-1e-4), Serial/world.cpp:63
    legacy_diffuse: bool = True            # diffuse uses normalize(lightPosition) — Serial/world.cpp:133 quirk
    smallest_dist: float = SMALLEST_DIST
    det_epsilon: float = DET_EPSILON
    ray_offset: float = 1e-4               # secondary-ray origin offset, Serial/world.cpp:97-103
    shadow_origin_bias: float = 0.01       # shadow-ray origin lerp factor, Serial/world.cpp:44
    beer_sigma: tuple = (0.27, 0.45, 0.55)  # exit-attenuation constants, Serial/world.cpp:85
    # acceleration: "bruteforce" | "chunked" (Morton chunk-AABB sweep) | "pallas".
    # WARNING: "chunked" is APPROXIMATE by construction — each ray block tests
    # only the top-`shortlist` most-voted chunks, so a hit in a chunk that
    # missed the shortlist is silently dropped. Exact modes: "bruteforce"
    # (reference semantics) and "pallas" (sweeps every visible chunk).
    accel: str = "bruteforce"
    # triangles per chunk for the sweep accel. 32 beats 64 at 1080p (+7%):
    # the kernel is epilogue-bound, so halving per-visit work wins over the
    # slightly longer chunk lists. 4*chunk_size must be a multiple of 128 for
    # the VMEM-resident layout (so 32 is the floor).
    chunk_size: int = 32
    # NOTE: a round-4 experiment routed OCCLUSION (any-mode) sweeps through a
    # coarser-chunk pack (shadow_chunk_size 64/128) on the theory that shadow
    # sweeps are visit-count-bound and the OR-reduce epilogue cheap. Measured
    # WORSE on both framings (hit-heavy 171.3/194.4 vs 159.0 ms, headline
    # 29.2/31.7 vs 26.6; benchmarks/exp_shadow64.py): coarser chunks test
    # nearly 2x/4x the triangles per listed visit and the lists do not
    # shrink proportionally. The knob was removed.
    # chunks tested per ray block (XLA chunked path). Scaled with the
    # chunk_size default (64->32) so shortlist*chunk_size coverage of the
    # APPROXIMATE chunked mode is unchanged.
    shortlist: int = 96
    ray_block: int = 2048                  # rays per lax.map block in XLA paths
    matmul_precision: str = "highest"      # pallas triangle-test MXU precision
    # MXU precision for OCCLUSION (any-mode / shadow) sweeps only. Occlusion
    # emits booleans, so "default" (single-pass bf16) spends 1/6 the matmul
    # passes of "highest" per visit; the price is bf16-resolution shadow
    # BOUNDARIES. Measured on TPU (benchmarks/exp_any_precision.py, which
    # also counts flipped pixels): hit-heavy 115.5 -> 108.4 ms, headline
    # 27.2 -> 24.7 ms, with 122-174 of 2.07M pixels (0.006-0.008%) flipped at
    # shadow edges — 20x under the boundary-pixel tolerance the golden suite
    # itself allows. Set "highest" to restore bit-parity with the closest
    # sweep. (CPU interpret mode is full-f32 either way, so the golden
    # oracle comparisons are unaffected. "high" is NotImplemented in-kernel;
    # full-"default" closest sweeps were measured FAR worse AND wrong —
    # 399ms hit-heavy with visible image drift.)
    occlusion_precision: str = "default"
    # wavefronts at or below this many rays use the EXACT per-ray chunk mask
    # (O(rays x chunks) VPU, blockwise so memory stays bounded) instead of
    # the conservative per-tile interval mask — decisive for divergent
    # secondary bounces (docs/KERNEL.md)
    exact_mask_rays: int = 1 << 19
    # force the exact mask for ALL secondary (shadow + child) queries
    # regardless of width. DEFAULT OFF (width heuristic): interval lists ARE
    # 2-2.5x looser than exact on close framings (benchmarks/exp_mask_stats),
    # but the kernel's front-to-back + all-occluded early exits already skip
    # most of that slack, so full-width exact masks cost more than they save
    # — measured hit-heavy 1080p: heuristic 247.7ms vs forced-exact 273.4ms
    # (round-3 ablation, numbers preserved in docs/KERNEL.md round-3
    # findings); headline difference is <1%.
    exact_mask_secondary: bool = False
    # inter-level wavefront compaction: deep bounce levels run on only the
    # live tiles (gathered to a power-of-two tile capacity via lax.switch) —
    # exact, shape-static, and the XLA shading work shrinks with the wavefront
    compact_levels: bool = True
    compact_buckets: int = 3               # capacities nt, nt/4, ..., nt/4^(b-1)
    # second, TILE-granular compaction for bounce levels >= 2: capacity
    # ladder cap, cap/4, ..., cap/4^(b-1) selected by live-TILE count (only
    # re-hits survive past level 1, and children inherit their parent's
    # lane, so tile structure persists). 0 disables (levels 2+ stay at the
    # level-0 capacity). Round 4 replaced the former LANE-granular variant,
    # whose row-granular gathers + per-lane scatter-adds measured
    # ~130ms/frame at a 522k-lane rung; tile gathers/scatters are the same
    # rung ladder for the TILE-granular dielectric (branching) wavefront:
    # the entry emits 2*cap child tiles but ordinary scenes keep only a
    # fraction live; bounce levels run at the smallest rung 2*cap/2^k that
    # fits the live-tile count (lax.switch; overflow mass reported like the
    # per-level compaction). benchmarks/bench_branching.py measures it.
    branch_buckets: int = 2
    # machinery the level-0 compaction uses. Measured (same-session A/B,
    # benchmarks/exp_deep_tiles.py, 1080p depth-3): hit-heavy 167.5 -> 116.0
    # ms (+44% throughput), headline 26.3 -> 26.7 ms; deep_buckets=3 adds
    # nothing over 2 (115.8 hh) and costs the headline another 0.3 ms.
    deep_buckets: int = 2
    # batch each level's shadow rays with the next level's reflection rays
    # into ONE closest query (one sweep invocation per level instead of
    # lights+1) — amortizes feature-build/chunk-mask/launch fixed costs
    merge_queries: bool = True
    # shadows as a separate batched FIRST-HIT (any-mode) sweep instead of
    # riding the merged closest query: occlusion gets the division-free
    # OR-reduce kernel epilogue and the all-occluded early exit; shadow rays
    # dominate secondary sweep work (profiled ~60% of per-level visits)
    shadow_any_mode: bool = True
    # rematerialized backward: recompute the differentiable shading in the
    # backward pass, saving ONLY the accel sweep results ("sweep"-tagged in
    # ops/intersect) — the naive full-frame backward materializes ~89GB of
    # residuals at 1080p. The sweep itself is never re-run.
    remat: bool = True
    # NOTE: two former knobs — reorder_secondary (Morton/octant re-tiling of
    # compacted secondary wavefronts) and reorder_children (coherence-sorting
    # only the child query) — were measured NET LOSERS on TPU (sort/permute
    # apparatus costs more than the tighter chunk lists save once the
    # kernel's early exits are in; docs/KERNEL.md round-3 ablations:
    # reorder_secondary +37ms/frame, reorder_children hit-heavy 291.7 vs
    # 247.7ms) and were REMOVED in round 4 rather than shipped untested.

    def __post_init__(self):
        # fail at construction, not deep inside a pallas kernel (ADVICE r4:
        # "high" occlusion precision is NotImplemented in-kernel and nothing
        # validated the field — a user setting it got a kernel-level error)
        _ACCELS = ("bruteforce", "chunked", "pallas")
        if self.accel not in _ACCELS:
            raise ValueError(f"accel={self.accel!r} not in {_ACCELS}")
        if self.matmul_precision not in ("default", "highest"):
            raise ValueError(
                f"matmul_precision={self.matmul_precision!r}: supported are "
                "'highest' (f32-accurate triangle tests; default) and "
                "'default' (bf16 — measured wrong AND slower for closest "
                "sweeps, see docs/KERNEL.md)")
        if self.occlusion_precision not in ("default", "highest"):
            raise ValueError(
                f"occlusion_precision={self.occlusion_precision!r}: supported "
                "are 'default' (single-pass bf16 occlusion; ships) and "
                "'highest' (bit-parity with the closest sweep); 'high' is "
                "NotImplemented in-kernel")
