"""Inter-level wavefront compaction (render/shade.py) must be invisible:
identical images and gradients with compact_levels on/off, across accel modes.
The compacted path gathers live tiles into lax.switch width buckets; these
tests pin its exactness (tiles are only skipped when truly dead)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from realtrace_tpu.apps import scenes
from realtrace_tpu.core.types import RenderConfig, SceneBuilder
from realtrace_tpu.ops import accel
from realtrace_tpu.render.pipeline import render_image
from realtrace_tpu.render.shade import trace_wavefront


def reflective_scene(dtype=jnp.float32):
    """Small scene with reflective floor + spheres so levels >= 1 stay live
    for a minority of pixels (the compaction target case)."""
    b = SceneBuilder(dtype=dtype)
    m_refl = b.material(kr=0.6)
    b.add_plane((-20, -2, -20), (20, -2, -20), (20, -2, 20), (-20, -2, 20),
                color=(0.4, 0.4, 0.45), material=m_refl)
    b.add_sphere((0, 0.5, 0), 1.5, color=(0.8, 0.2, 0.1), material=m_refl)
    b.add_sphere((3, 0, 2), 1.0, color=(0.1, 0.6, 0.2), material=b.material())
    rng = np.random.default_rng(5)
    for ctr in rng.uniform(-6, 6, (40, 3)):
        tri = ctr + np.array([0, 2.5, 0]) + rng.uniform(-1, 1, (3, 3))
        b.add_triangle(tri[0], tri[1], tri[2], material=m_refl)
    b.add_light((0, 30, 30), (1, 1, 1))
    b.ambient = (1, 1, 1)
    b.background = (0.1, 0.3, 0.6)
    return b.build()


def _cfgs(accel_mode):
    base = RenderConfig(max_depth=4, accel=accel_mode, chunk_size=32)
    # deep_buckets=3 exercises the tile-granular deep re-compaction ladder
    # (levels >= 2 at a second, smaller tile capacity): it must be invisible
    on = dataclasses.replace(base, compact_levels=True, compact_buckets=4,
                             deep_buckets=3)
    off = dataclasses.replace(base, compact_levels=False)
    return on, off


def _render(scene, cfg, n=96):
    cam = scenes.make_camera(
        dict(position=(10, 6, 10), target=(0, 0, 0), up=(0, 1, 0), fovy=45),
        n, n, dtype=jnp.float32)
    return render_image(scene, cam, cfg, branching=False)


def test_compaction_image_exact_bruteforce():
    scene = reflective_scene()
    on, off = _cfgs("bruteforce")
    a = np.asarray(_render(scene, on))
    b = np.asarray(_render(scene, off))
    # compaction reshapes the per-level ops, so XLA fuses them differently;
    # only float drift at the fusion level is tolerated
    np.testing.assert_allclose(a, b, atol=2e-5)


def test_compaction_image_exact_pallas_interpret():
    scene = reflective_scene()
    on, off = _cfgs("pallas")
    scene = accel.with_chunks(scene, on)
    a = np.asarray(_render(scene, on))
    b = np.asarray(_render(scene, off))
    np.testing.assert_allclose(a, b, atol=2e-5)


def test_compaction_grads_match():
    scene = reflective_scene()
    on, off = _cfgs("bruteforce")
    target = np.asarray(_render(scene, off, n=64))

    def loss(s, cfg):
        img = _render(s, cfg, n=64)
        return jnp.mean((img - target) ** 2), img

    diff_leaves = lambda s: (s.sph_center, s.sph_radius, s.sph_color,
                             s.lights.position, s.lights.intensity)
    g_on = jax.grad(lambda s: loss(s, on)[0])(scene)
    g_off = jax.grad(lambda s: loss(s, off)[0])(scene)
    for a, b in zip(diff_leaves(g_on), diff_leaves(g_off)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)


def test_compaction_with_stats_ray_count_matches():
    scene = reflective_scene()
    on, off = _cfgs("bruteforce")
    cam = scenes.make_camera(
        dict(position=(10, 6, 10), target=(0, 0, 0), up=(0, 1, 0), fovy=45),
        64, 64, dtype=jnp.float32)
    ro, rd = cam.ray_origins(), cam.ray_directions()
    _, n_on = trace_wavefront(scene, ro, rd, on, branching=False, with_stats=True)
    _, n_off = trace_wavefront(scene, ro, rd, off, branching=False, with_stats=True)
    assert float(n_on) == float(n_off)


def dielectric_scene(dtype=jnp.float32):
    """Glass + reflective spheres over a DIFFUSE floor: the BRANCHING
    (reflect ‖ refract) wavefront runs with live child TILES a minority —
    the tile-compaction target case. (A frame whose every tile keeps
    spawning two live children overflows the 2x-cap tile capacity by
    design, like the lane path's glass-shells overflow case in
    tests/test_branching.py — the drop is reported, not silent.)"""
    b = SceneBuilder(dtype=dtype)
    glass = b.material(ka=0.1, kd=0.2, ks=0.3, kr=0.3, kt=0.8, eta=1.5)
    b.add_plane((-20, -2, -20), (20, -2, -20), (20, -2, 20), (-20, -2, 20),
                color=(0.4, 0.4, 0.45), material=b.material())   # kr=0 floor
    b.add_sphere((0, 0.5, 0), 1.5, color=(0.9, 0.9, 1.0), material=glass)
    b.add_sphere((3, 0, 2), 1.0, color=(0.1, 0.6, 0.2),
                 material=b.material(kr=0.6))
    rng = np.random.default_rng(9)
    for ctr in rng.uniform(-6, 6, (40, 3)):
        tri = ctr + np.array([0, 2.5, 0]) + rng.uniform(-1, 1, (3, 3))
        b.add_triangle(tri[0], tri[1], tri[2], material=b.material())
    b.add_light((0, 30, 30), (1, 1, 1))
    b.ambient = (1, 1, 1)
    b.background = (0.1, 0.3, 0.6)
    return b.build()


def test_branching_tile_compaction_matches_flat():
    """The TILE-granular branching wavefront (compact_levels, nt >= 4) must
    reproduce the flat per-lane branching path exactly: same image, zero
    dropped mass on an ordinary dielectric scene, same traced-ray count."""
    scene = dielectric_scene()
    assert scene.has_dielectrics()
    on, off = _cfgs("bruteforce")
    cam = scenes.make_camera(
        dict(position=(10, 6, 10), target=(0, 0, 0), up=(0, 1, 0), fovy=45),
        128, 64, dtype=jnp.float32)        # 8 wavefront tiles -> compacted
    ro, rd = cam.ray_origins(), cam.ray_directions()
    stats_on, stats_off = {}, {}
    img_on, n_on = trace_wavefront(scene, ro, rd, on, branching=True,
                                   with_stats=True, debug_stats=stats_on)
    img_off, n_off = trace_wavefront(scene, ro, rd, off, branching=True,
                                     with_stats=True, debug_stats=stats_off)
    assert float(stats_on["dropped_children_coeff"]) == 0.0
    assert float(stats_off["dropped_children_coeff"]) == 0.0
    assert float(n_on) == float(n_off)
    # branching shading chains (Fresnel pow5, Beer exp) amplify f32
    # fusion-order drift past the non-branching 2e-5; observed max 5.5e-5
    np.testing.assert_allclose(np.asarray(img_on), np.asarray(img_off),
                               atol=1e-4)


def test_branching_tile_compaction_grads_match():
    """Gradients through the TILE-granular branching wavefront must equal
    the flat path's (the tile gathers/scatters are linear index ops)."""
    scene = dielectric_scene()
    on, off = _cfgs("bruteforce")
    cam = scenes.make_camera(
        dict(position=(10, 6, 10), target=(0, 0, 0), up=(0, 1, 0), fovy=45),
        128, 64, dtype=jnp.float32)
    ro, rd = cam.ray_origins(), cam.ray_directions()

    def loss(s, cfg):
        return jnp.mean(trace_wavefront(s, ro, rd, cfg, branching=True) ** 2)

    diff_leaves = lambda s: (s.sph_center, s.sph_radius, s.sph_color,
                             s.lights.position, s.lights.intensity)
    g_on = jax.grad(lambda s: loss(s, on))(scene)
    g_off = jax.grad(lambda s: loss(s, off))(scene)
    for a, b in zip(diff_leaves(g_on), diff_leaves(g_off)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_branching_tile_compaction_pallas_interpret():
    """Same equality through the pallas accel path (interpret on CPU)."""
    scene = dielectric_scene()
    on, off = _cfgs("pallas")
    scene = accel.with_chunks(scene, on)
    cam = scenes.make_camera(
        dict(position=(10, 6, 10), target=(0, 0, 0), up=(0, 1, 0), fovy=45),
        128, 64, dtype=jnp.float32)
    ro, rd = cam.ray_origins(), cam.ray_directions()
    img_on = trace_wavefront(scene, ro, rd, on, branching=True)
    img_off = trace_wavefront(scene, ro, rd, off, branching=True)
    np.testing.assert_allclose(np.asarray(img_on), np.asarray(img_off),
                               atol=1e-4)
