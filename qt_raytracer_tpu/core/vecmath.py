"""Batched 3-vector math on [..., 3] arrays.

TPU-native counterpart of the reference's scalar ``Vec3`` class and free
functions (include/raytracer/RayTracer.h:64-184). Everything is elementwise
over a trailing axis of 3 so the VPU vectorizes across rays, and all helpers
are differentiable.
"""

from __future__ import annotations

import jax.numpy as jnp


def dot(u, v):
    """Batched dot product over the trailing axis (RayTracer.h:141-143)."""
    return jnp.sum(u * v, axis=-1)


def cross(u, v):
    """Batched cross product (RayTracer.h:145-149)."""
    return jnp.cross(u, v)


def length_squared(v):
    return jnp.sum(v * v, axis=-1)


def length(v):
    return jnp.sqrt(length_squared(v))


def unit_vector(v, eps: float = 0.0):
    """v / |v| (RayTracer.h:151-153). eps guards the degenerate zero vector."""
    return v / jnp.maximum(length(v), eps)[..., None] if eps else v / length(v)[..., None]


def reflect(v, n):
    """Mirror reflection v - 2(v.n)n (RayTracer.h:175-177)."""
    return v - 2.0 * dot(v, n)[..., None] * n


def refract(uv, n, etai_over_etat):
    """Snell refraction of unit vector uv about n (RayTracer.h:179-184)."""
    cos_theta = jnp.minimum(dot(-uv, n), 1.0)
    r_out_perp = etai_over_etat[..., None] * (uv + cos_theta[..., None] * n)
    r_out_parallel = (
        -jnp.sqrt(jnp.abs(1.0 - length_squared(r_out_perp)))[..., None] * n
    )
    return r_out_perp + r_out_parallel


def degrees_to_radians(deg):
    return deg * (jnp.pi / 180.0)
