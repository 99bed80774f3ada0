"""Triangle meshes: SoA geometry + Möller-Trumbore intersection.

No reference counterpart (the reference renders spheres only); this is the
north-star BASELINE config 4 capability (~100k-triangle mesh with BVH at
1080p). Geometry is pre-expanded to per-triangle SoA (v0, e1, e2, normal) so
the intersector is pure FMA work with zero indexed vertex fetches.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from ..utils.pytree import pytree_dataclass


@pytree_dataclass
class TriangleMesh:
    """SoA triangle soup, BVH-reordered. One material for the whole mesh
    (same parameter model as spheres: mat_type/albedo/fuzz/ior/emission)."""

    v0: jnp.ndarray         # [F, 3] first vertex (BVH leaf order)
    e1: jnp.ndarray         # [F, 3] v1 - v0
    e2: jnp.ndarray         # [F, 3] v2 - v0
    geom_normal: jnp.ndarray  # [F, 3] unit geometric normal
    # Flattened BVH (accel/bvh.py layout), escape-index DFS:
    bvh_min: jnp.ndarray    # [M, 3]
    bvh_max: jnp.ndarray    # [M, 3]
    bvh_escape: jnp.ndarray  # [M] i32
    bvh_start: jnp.ndarray  # [M] i32
    bvh_count: jnp.ndarray  # [M] i32
    # Material (scalars broadcast over all faces):
    mat_type: jnp.ndarray   # [] i32
    albedo: jnp.ndarray     # [3]
    fuzz: jnp.ndarray       # []
    ior: jnp.ndarray        # []
    emission: jnp.ndarray   # [3]

    @property
    def num_triangles(self) -> int:
        return self.v0.shape[0]


def build_mesh(vertices: np.ndarray, faces: np.ndarray,
               mat_type: int = 0, albedo=(0.8, 0.8, 0.8), fuzz: float = 0.0,
               ior: float = 1.5, emission=(0.0, 0.0, 0.0),
               max_leaf: int = 4, builder: str = "auto") -> TriangleMesh:
    """Host-side mesh freeze: expand triangles, build BVH, reorder.

    builder: "auto" prefers the native C++ SAH builder (runtime/native_bvh),
    falling back to the numpy median builder.
    """
    vertices = np.asarray(vertices, np.float64)
    faces = np.asarray(faces, np.int64)
    tri = vertices[faces]                      # [F, 3, 3]
    bb_min = tri.min(axis=1).astype(np.float32)
    bb_max = tri.max(axis=1).astype(np.float32)

    bvh = None
    if builder in ("auto", "native"):
        try:
            from ..runtime.native_bvh import build_bvh_native
            bvh = build_bvh_native(bb_min, bb_max, max_leaf=max_leaf)
        except Exception:
            if builder == "native":
                raise
    if bvh is None:
        from .bvh import build_bvh
        bvh = build_bvh(bb_min, bb_max, max_leaf=max_leaf)

    tri = tri[bvh.prim_order]                  # leaf-contiguous order
    v0 = tri[:, 0]
    e1 = tri[:, 1] - tri[:, 0]
    e2 = tri[:, 2] - tri[:, 0]
    n = np.cross(e1, e2)
    n /= np.maximum(np.linalg.norm(n, axis=1, keepdims=True), 1e-20)

    f32 = lambda x: jnp.asarray(x, jnp.float32)
    return TriangleMesh(
        v0=f32(v0), e1=f32(e1), e2=f32(e2), geom_normal=f32(n),
        bvh_min=f32(bvh.bbox_min), bvh_max=f32(bvh.bbox_max),
        bvh_escape=jnp.asarray(bvh.escape), bvh_start=jnp.asarray(bvh.prim_start),
        bvh_count=jnp.asarray(bvh.prim_count),
        mat_type=jnp.asarray(mat_type, jnp.int32), albedo=f32(albedo),
        fuzz=f32(fuzz), ior=f32(ior), emission=f32(emission),
    )


class TriHit(NamedTuple):
    t: jnp.ndarray        # [N] (BIG on miss)
    tri_idx: jnp.ndarray  # [N] i32
    hit: jnp.ndarray      # [N] bool


def moller_trumbore(v0, e1, e2, o, d, t_min, t_max):
    """Batched Möller-Trumbore: triangles [K,3] vs rays [N,3] -> t [N,K].

    Backface culling OFF (both orientations hit), matching the two-sided
    spheres of the reference. Returns BIG where invalid.
    """
    big = jnp.float32(3.0e38)
    p = jnp.cross(d[:, None, :], e2[None, :, :])          # [N,K,3]
    det = jnp.sum(p * e1[None, :, :], axis=-1)            # [N,K]
    inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
    s = o[:, None, :] - v0[None, :, :]                    # [N,K,3]
    u = jnp.sum(s * p, axis=-1) * inv_det
    q = jnp.cross(s, e1[None, :, :])                      # [N,K,3]
    v = jnp.sum(q * d[:, None, :], axis=-1) * inv_det
    t = jnp.sum(q * e2[None, :, :], axis=-1) * inv_det
    ok = ((jnp.abs(det) > 1e-12) & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
          & (t >= t_min) & (t <= t_max))
    return jnp.where(ok, t, big)
