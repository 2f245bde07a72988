"""Unit tests for batched vector math (L0 of the layer map, SURVEY §1)."""
import jax.numpy as jnp
import numpy as np
import pytest

from realtrace_tpu.core import vec


def rng(*shape):
    return np.random.default_rng(sum(shape) + 7).standard_normal(shape)


def test_dot_cross_batched():
    a, b = rng(5, 3), rng(5, 3)
    np.testing.assert_allclose(vec.dot(jnp.asarray(a), jnp.asarray(b)),
                               np.einsum("ij,ij->i", a, b), atol=1e-12)
    np.testing.assert_allclose(vec.cross(jnp.asarray(a), jnp.asarray(b)),
                               np.cross(a, b), atol=1e-12)


def test_normalize_unit_and_zero():
    a = rng(4, 3)
    n = np.asarray(vec.normalize(jnp.asarray(a)))
    np.testing.assert_allclose(np.linalg.norm(n, axis=-1), 1.0, atol=1e-12)
    z = np.asarray(vec.normalize(jnp.zeros((2, 3))))
    assert np.all(z == 0.0)  # zero-vectors stay zero (dead wavefront lanes)


def test_reflect_matches_reference_formula():
    # I - 2 (N.I) N, Serial/world.cpp:27-30
    i = np.array([[1.0, -1.0, 0.0]])
    n = np.array([[0.0, 1.0, 0.0]])
    r = np.asarray(vec.reflect(jnp.asarray(i), jnp.asarray(n)))
    np.testing.assert_allclose(r, [[1.0, 1.0, 0.0]], atol=1e-12)


def test_refract_snell_and_tir():
    n = jnp.asarray([[0.0, 1.0, 0.0]])
    i = vec.normalize(jnp.asarray([[1.0, -1.0, 0.0]]))
    t, ok = vec.refract(i, n, jnp.asarray([1.0 / 1.5]))
    assert bool(ok[0])
    # Snell: sin(theta_t) = sin(45°)/1.5
    sin_t = float(jnp.abs(vec.normalize(t)[0, 0]))
    np.testing.assert_allclose(sin_t, np.sin(np.pi / 4) / 1.5, atol=1e-7)
    # TIR: dense-to-sparse beyond critical angle
    t2, ok2 = vec.refract(i, n, jnp.asarray([1.5]))
    assert not bool(ok2[0])
    assert np.all(np.asarray(t2) == 0.0)


def test_det3_matches_numpy():
    c1, c2, c3 = rng(6, 3), rng(6, 3), rng(6, 3)
    m = np.stack([c1, c2, c3], axis=-1)  # columns
    np.testing.assert_allclose(
        vec.det3(jnp.asarray(c1), jnp.asarray(c2), jnp.asarray(c3)),
        np.linalg.det(m), atol=1e-10)
