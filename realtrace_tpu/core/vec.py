"""Batched 3-vector math on ``(..., 3)`` arrays.

TPU-native replacement for the reference's scalar vector classes
(``Serial/vector3D.h:7-56``, ``Parellel/structures.cu:8-113``). Everything here
operates on arbitrarily-batched trailing-dim-3 arrays so the whole image's rays
are processed as one dense SoA batch on the VPU — no per-ray objects.
"""
from __future__ import annotations

import jax.numpy as jnp
from jax import Array


def dot(a: Array, b: Array) -> Array:
    """Batched dot product. Ref: dotProduct, Serial/vector3D.cpp."""
    return jnp.sum(a * b, axis=-1)


def cross(a: Array, b: Array) -> Array:
    """Batched cross product. Ref: crossProduct, Serial/vector3D.cpp."""
    return jnp.cross(a, b)


def length(a: Array) -> Array:
    return jnp.sqrt(dot(a, a))


def normalize(a: Array, eps: float = 0.0) -> Array:
    """Normalize; zero vectors stay zero when eps>0 guards the division.

    The reference's ``Vector3D::normalize`` divides by length unconditionally;
    we guard to keep autodiff NaN-free on dead (zero-direction) wavefront lanes.
    """
    n2 = dot(a, a)[..., None]
    if eps:
        n2 = jnp.maximum(n2, eps)
    return a * jnp.where(n2 > 0, 1.0 / jnp.sqrt(jnp.where(n2 > 0, n2, 1.0)), 0.0)


def reflect(i: Array, n: Array) -> Array:
    """Mirror reflection of direction ``i`` about normal ``n``.

    Ref: ``reflect``, Serial/world.cpp:27-30.
    """
    return i - 2.0 * dot(n, i)[..., None] * n


def refract(i: Array, n: Array, eta: Array) -> tuple[Array, Array]:
    """Snell refraction. Returns (T, ok) where ok=False means total internal
    reflection (T is zeros there).

    Ref: ``refract``, Serial/world.cpp:19-25.
    """
    ndi = dot(n, i)
    k = 1.0 - eta * eta * (1.0 - ndi * ndi)
    ok = k >= 0.0
    # double-where with STRICT k>0: sqrt(0) forward is fine but its backward
    # is infinite, and k==0 occurs on dead wavefront lanes (zero normals)
    pos = k > 0.0
    sq = jnp.where(pos, jnp.sqrt(jnp.where(pos, k, 1.0)), 0.0)
    t = eta[..., None] * i - (eta * ndi + sq)[..., None] * n
    return jnp.where(ok[..., None], t, 0.0), ok


def det3(c1: Array, c2: Array, c3: Array) -> Array:
    """Determinant of the 3x3 matrix with columns c1,c2,c3 (batched).

    Ref: ``determinant(Vector3D,Vector3D,Vector3D)``, Serial/utilities.cpp:17-22.
    Written as a scalar triple product so XLA fuses it into the intersection
    kernels.
    """
    return dot(c1, cross(c2, c3))


def distance(a: Array, b: Array) -> Array:
    """Euclidean distance. Ref: ``distance``, Serial/world.cpp:120-123."""
    return length(a - b)
