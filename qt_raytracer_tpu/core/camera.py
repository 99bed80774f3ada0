"""Thin-lens camera as a differentiable pytree.

Mirrors the reference camera model (include/raytracer/RayTracer.h:543-576):
vfov/aspect viewport, (lookfrom, lookat, vup) basis, focus-distance-scaled
image plane, aperture/2 lens radius, and lens-disk origin jitter in
``get_ray``. All fields are jnp arrays so camera parameters are first-class
gradient targets (north-star inverse-rendering requirement).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..utils.pytree import pytree_dataclass
from . import sampling, vecmath as vm


@pytree_dataclass
class Camera:
    origin: jnp.ndarray             # [3]
    lower_left_corner: jnp.ndarray  # [3]
    horizontal: jnp.ndarray         # [3]
    vertical: jnp.ndarray           # [3]
    u: jnp.ndarray                  # [3] camera-right
    v: jnp.ndarray                  # [3] camera-up
    w: jnp.ndarray                  # [3] backward (lookfrom - lookat, unit)
    lens_radius: jnp.ndarray        # [] aperture / 2


def make_camera(
    lookfrom,
    lookat,
    vup=(0.0, 1.0, 0.0),
    vfov: float = 20.0,
    aspect_ratio: float = 16.0 / 9.0,
    aperture: float = 0.0,
    focus_dist: float = 1.0,
    dtype=jnp.float32,
) -> Camera:
    """Build a Camera exactly as RayTracer.h:545-561 does."""
    lookfrom = jnp.asarray(lookfrom, dtype)
    lookat = jnp.asarray(lookat, dtype)
    vup = jnp.asarray(vup, dtype)
    vfov = jnp.asarray(vfov, dtype)
    aspect_ratio = jnp.asarray(aspect_ratio, dtype)
    focus_dist = jnp.asarray(focus_dist, dtype)
    aperture = jnp.asarray(aperture, dtype)

    theta = vm.degrees_to_radians(vfov)
    h = jnp.tan(theta / 2.0)
    viewport_height = 2.0 * h
    viewport_width = aspect_ratio * viewport_height

    w = vm.unit_vector(lookfrom - lookat)
    u = vm.unit_vector(vm.cross(vup, w))
    v = vm.cross(w, u)

    origin = lookfrom
    horizontal = focus_dist * viewport_width * u
    vertical = focus_dist * viewport_height * v
    lower_left_corner = origin - horizontal / 2.0 - vertical / 2.0 - focus_dist * w

    return Camera(
        origin=origin,
        lower_left_corner=lower_left_corner,
        horizontal=horizontal,
        vertical=vertical,
        u=u,
        v=v,
        w=w,
        lens_radius=aperture / 2.0,
    )


def get_rays(camera: Camera, s, t, lens_u1, lens_u2):
    """Batched Camera::get_ray (RayTracer.h:563-567).

    s, t: [N] viewport coordinates in [0,1]; lens_u1/u2: [N] uniforms for the
    lens-disk sample. Returns (origins [N,3], directions [N,3]); directions are
    deliberately NOT normalized, matching the reference.
    """
    rd = camera.lens_radius * sampling.random_in_unit_disk(lens_u1, lens_u2)
    offset = rd[..., 0:1] * camera.u + rd[..., 1:2] * camera.v
    origin = camera.origin + offset
    direction = (
        camera.lower_left_corner
        + s[..., None] * camera.horizontal
        + t[..., None] * camera.vertical
        - camera.origin
        - offset
    )
    return origin, direction
