"""OBJ loader tests against the bundled reference assets (SURVEY §2.1 assets
row: bob 5,344 v / 10,688 f, tetrahedron 7 v / 14 f)."""
import numpy as np
import pytest

from realtrace_tpu.io.obj import parse_obj, sample_vertex_colors


def test_tetrahedron_counts_and_scale(reference_assets):
    m = parse_obj(reference_assets / "tetrahedron.obj", scale=15.0)
    assert m.vertices.shape[0] == 7
    assert m.n_faces == 14
    m1 = parse_obj(reference_assets / "tetrahedron.obj", scale=1.0)
    np.testing.assert_allclose(m.vertices, m1.vertices * 15.0)


def test_bob_counts(reference_assets):
    m = parse_obj(reference_assets / "bob_tri.obj")
    assert m.vertices.shape[0] == 5344
    assert m.n_faces == 10688
    assert m.uvs.shape[0] > 0
    assert (m.tri_vertex_idx >= 0).all() and (m.tri_vertex_idx < 5344).all()


def test_max_faces_cap(reference_assets):
    m = parse_obj(reference_assets / "bob_tri.obj", max_faces=2000)
    assert m.n_faces == 2000  # serial 2000-triangle cap, Serial/lumina.cpp:266


def test_vertex_colors_default_without_texture(reference_assets):
    m = parse_obj(reference_assets / "tetrahedron.obj")
    c = sample_vertex_colors(m, None, default_color=(0.8, 0.1, 0.0))
    assert c.shape == (14, 3, 3)
    np.testing.assert_allclose(c[0, 0], [0.8, 0.1, 0.0])


def test_texture_sampling_in_range(reference_assets):
    m = parse_obj(reference_assets / "bob_tri.obj")
    c = sample_vertex_colors(m, reference_assets / "bob_diffuse.png")
    assert c.shape == (10688, 3, 3)
    assert (c >= 0.0).all() and (c <= 1.0).all()
    # textured faces should not all be the default color
    assert not np.allclose(c, c[0, 0])
