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


def test_native_parser_matches_python(reference_assets, monkeypatch):
    """The C++ parser (csrc/objloader.cpp) must agree with the pure-python
    fallback field-for-field."""
    import realtrace_tpu.io.obj as objmod
    from realtrace_tpu.io import native_obj

    native = native_obj.parse(reference_assets / "bob_tri.obj")
    monkeypatch.setattr(objmod, "_try_native", lambda p: None)
    py = objmod.parse_obj(reference_assets / "bob_tri.obj")
    v, vn, vt, fv, ft = native
    np.testing.assert_allclose(v, py.vertices)
    np.testing.assert_allclose(vn, py.normals)
    np.testing.assert_allclose(vt, py.uvs)
    np.testing.assert_array_equal(fv, py.tri_vertex_idx)
    np.testing.assert_array_equal(ft, py.tri_uv_idx)


def test_parse_obj_uses_native_fast_path(reference_assets):
    import time

    from realtrace_tpu.io.obj import parse_obj
    t0 = time.perf_counter()
    m = parse_obj(reference_assets / "blub_triangulated.obj")
    dt = time.perf_counter() - t0
    assert m.n_faces == 14208
    assert dt < 2.0  # native path parses 14k faces in ms, python in ~1s
