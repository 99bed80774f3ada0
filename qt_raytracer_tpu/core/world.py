"""World = spheres + optional triangle mesh, with a unified closest-hit.

The reference has exactly one primitive type (Sphere); the mesh side is the
north-star config-4 extension. A World merges both primitive families into
one Hits batch with a single id space:

    prim_idx < num_spheres          -> sphere hit
    prim_idx >= num_spheres         -> mesh triangle (idx - num_spheres)

(the offset keeps NEE's shadow test — "first hit IS the chosen light sphere"
— correct when meshes occlude). Mesh hit distances are re-derived
differentiably for the winning triangle, so mesh vertices and materials are
gradient targets just like sphere parameters.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..accel.mesh import TriangleMesh
from ..accel.traverse import intersect_mesh
from ..utils.pytree import pytree_dataclass
from . import vecmath as vm
from .intersect import BIG, Hits, intersect_spheres
from .scene import SphereScene


@pytree_dataclass
class World:
    spheres: SphereScene
    mesh: Optional[TriangleMesh]


def as_world(scene) -> World:
    """Accept a bare SphereScene (reference-parity API) or a full World."""
    if isinstance(scene, World):
        return scene
    return World(spheres=scene, mesh=None)


def _tri_t_diff(mesh: TriangleMesh, tri_idx, o, d, t_min, t_max):
    """Differentiable Möller-Trumbore t for per-lane selected triangles
    (the gradient path for mesh geometry; the traversal itself is detached)."""
    v0 = mesh.v0[tri_idx]
    e1 = mesh.e1[tri_idx]
    e2 = mesh.e2[tri_idx]
    p = jnp.cross(d, e2)
    det = jnp.sum(p * e1, axis=-1)
    ok = jnp.abs(det) > 1e-12
    inv_det = jnp.where(ok, 1.0 / jnp.where(ok, det, 1.0), 0.0)
    s = o - v0
    q = jnp.cross(s, e1)
    t = jnp.sum(q * e2, axis=-1) * inv_det
    return t, ok & (t >= t_min) & (t <= t_max)


def intersect_world(world: World, origins, directions, t_min,
                    backend: str = "xla", alive=None) -> Hits:
    """Closest hit over every primitive family, merged into one Hits."""
    hs = intersect_spheres(world.spheres, origins, directions, t_min,
                           backend=backend, alive=alive)
    mesh = world.mesh
    if mesh is None:
        return hs

    if backend in ("pallas", "pallas_interpret"):
        from ..kernels.mesh_intersect import mesh_search_pallas

        t_m, idx_m = mesh_search_pallas(
            mesh, origins, directions, float(t_min),
            interpret=(backend == "pallas_interpret"), alive=alive)
        from ..accel.mesh import TriHit
        th = TriHit(t=t_m, tri_idx=idx_m, hit=t_m < BIG)
    else:
        th = intersect_mesh(mesh, origins, directions, t_min, alive=alive)
    # Differentiable recompute of the winner's t (traversal is detached).
    t_d, ok_d = _tri_t_diff(mesh, th.tri_idx, origins, directions, t_min, BIG)
    t_tri = jnp.where(th.hit & ok_d, t_d, jax.lax.stop_gradient(th.t))

    closer = th.hit & (~hs.hit | (t_tri < hs.t))
    n = origins.shape[0]
    t = jnp.where(closer, t_tri, hs.t)
    hit = hs.hit | th.hit
    prim_idx = jnp.where(
        closer, world.spheres.num_spheres + th.tri_idx, hs.prim_idx)

    t_safe = jnp.where(hit, t, 1.0)
    point_m = origins + t_safe[:, None] * directions
    gn = mesh.geom_normal[th.tri_idx]
    ff_m = vm.dot(directions, gn) < 0.0
    normal_m = jnp.where(ff_m[:, None], gn, -gn)

    b3 = lambda v: jnp.broadcast_to(v, (n, 3))
    b1 = lambda v: jnp.broadcast_to(v, (n,))
    sel3 = lambda m_val, s_val: jnp.where(closer[:, None], m_val, s_val)
    sel1 = lambda m_val, s_val: jnp.where(closer, m_val, s_val)

    return Hits(
        t=t, prim_idx=prim_idx, hit=hit,
        point=sel3(point_m, hs.point),
        normal=sel3(normal_m, hs.normal),
        front_face=sel1(ff_m, hs.front_face),
        mat_type=sel1(b1(mesh.mat_type), hs.mat_type),
        albedo=sel3(b3(mesh.albedo), hs.albedo),
        fuzz=sel1(b1(mesh.fuzz), hs.fuzz),
        ior=sel1(b1(mesh.ior), hs.ior),
        emission=sel3(b3(mesh.emission), hs.emission),
    )
