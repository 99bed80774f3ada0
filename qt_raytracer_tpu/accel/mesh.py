"""Triangle meshes: SoA geometry + per-face materials + Möller-Trumbore.

No reference counterpart (the reference renders spheres only; materials
attach per *object*, include/raytracer/RayTracer.h:276-280); this is the
north-star BASELINE config 4 capability (~100k-triangle mesh with BVH at
1080p) plus config 2's true area lights: every face carries its own material
row, so one mesh expresses multi-material models (OBJ groups, Cornell boxes
with an emissive light quad). Geometry is pre-expanded to per-triangle SoA
(v0, e1, e2, normal) so the intersector is pure FMA work with zero indexed
vertex fetches.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from ..utils.pytree import pytree_dataclass

EMISSIVE = 3  # == core.scene.EMISSIVE (redeclared to avoid a cycle)


@pytree_dataclass
class TriangleMesh:
    """SoA triangle soup, BVH-reordered, with PER-FACE materials
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
    # Per-face materials:
    mat_type: jnp.ndarray   # [F] i32
    albedo: jnp.ndarray     # [F, 3]
    fuzz: jnp.ndarray       # [F]
    ior: jnp.ndarray        # [F]
    emission: jnp.ndarray   # [F, 3]
    # Emissive face indices (BVH order) for next-event estimation;
    # shape [0] when the mesh has no lights (static, host-known).
    light_tri: jnp.ndarray  # [Lt] i32

    @property
    def num_triangles(self) -> int:
        return self.v0.shape[0]

    @property
    def num_lights(self) -> int:
        return self.light_tri.shape[0]


def _per_face(x, f: int, width: int | None) -> np.ndarray:
    """Broadcast a scalar/single-row material field to [F] (or [F, width])."""
    a = np.asarray(x, np.float64)
    if width is None:
        return np.broadcast_to(a.reshape(-1), (f,)) if a.size == 1 \
            else a.reshape(f)
    if a.ndim == 1:
        a = a.reshape(1, width)
    return np.broadcast_to(a, (f, width))


def build_mesh(vertices: np.ndarray, faces: np.ndarray,
               mat_type=0, albedo=(0.8, 0.8, 0.8), fuzz=0.0,
               ior=1.5, emission=(0.0, 0.0, 0.0),
               max_leaf: int = 4, builder: str = "auto") -> TriangleMesh:
    """Host-side mesh freeze: expand triangles, build BVH, reorder.

    Material fields may be scalars/single RGB rows (applied to every face)
    or per-face arrays ([F] / [F,3]) — the reference's material-per-object
    becomes material-per-face.

    builder: "auto" prefers the native C++ SAH builder (runtime/native_bvh),
    falling back to the numpy median builder.
    """
    vertices = np.asarray(vertices, np.float64)
    faces = np.asarray(faces, np.int64)
    f = len(faces)
    tri = vertices[faces]                      # [F, 3, 3]
    bb_min = tri.min(axis=1).astype(np.float32)
    bb_max = tri.max(axis=1).astype(np.float32)
    # Epsilon-pad the primitive boxes: axis-aligned faces (quads, Cornell
    # walls) produce ZERO-THICKNESS AABBs that the strict slab test
    # (exit > enter, RayTracer.h:229-244 semantics) can never pass, and
    # f32 slab rounding can graze-miss tight hulls. The pad is relative to
    # the scene scale so it is invisible at image precision.
    scale = float(max(bb_max.max() - bb_min.min(), 1e-3))
    eps = np.float32(1e-5 * scale)
    bb_min -= eps
    bb_max += eps

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

    order = bvh.prim_order
    tri = tri[order]                           # leaf-contiguous order
    v0 = tri[:, 0]
    e1 = tri[:, 1] - tri[:, 0]
    e2 = tri[:, 2] - tri[:, 0]
    n = np.cross(e1, e2)
    n /= np.maximum(np.linalg.norm(n, axis=1, keepdims=True), 1e-20)

    mt = _per_face(mat_type, f, None).astype(np.int32)[order]
    alb = _per_face(albedo, f, 3)[order]
    fz = np.minimum(_per_face(fuzz, f, None), 1.0)[order]  # Metal fuzz <= 1
    io = _per_face(ior, f, None)[order]
    em = _per_face(emission, f, 3)[order]
    lights = np.nonzero(mt == EMISSIVE)[0].astype(np.int32)

    f32 = lambda x: jnp.asarray(x, jnp.float32)
    return TriangleMesh(
        v0=f32(v0), e1=f32(e1), e2=f32(e2), geom_normal=f32(n),
        bvh_min=f32(bvh.bbox_min), bvh_max=f32(bvh.bbox_max),
        bvh_escape=jnp.asarray(bvh.escape), bvh_start=jnp.asarray(bvh.prim_start),
        bvh_count=jnp.asarray(bvh.prim_count),
        mat_type=jnp.asarray(mt), albedo=f32(alb),
        fuzz=f32(fz), ior=f32(io), emission=f32(em),
        light_tri=jnp.asarray(lights),
    )


class MeshBuilder:
    """Host-side accumulation of multi-material triangle geometry, then
    freeze to ONE TriangleMesh (one BVH, per-face material rows).

    The quad/box helpers are what make BASELINE config 2 expressible: a real
    Cornell box is quads with per-face albedos plus an emissive light quad —
    the reference has no analog (spheres only)."""

    def __init__(self):
        self._verts: list[np.ndarray] = []
        self._faces: list[np.ndarray] = []
        self._mats: list[tuple] = []   # (count, mat_type, albedo, fuzz, ior, emission)
        self._nv = 0

    def add_triangles(self, vertices, faces, mat_type=0,
                      albedo=(0.8, 0.8, 0.8), fuzz=0.0, ior=1.5,
                      emission=(0.0, 0.0, 0.0)) -> "MeshBuilder":
        vertices = np.asarray(vertices, np.float64).reshape(-1, 3)
        faces = np.asarray(faces, np.int64).reshape(-1, 3)
        self._verts.append(vertices)
        self._faces.append(faces + self._nv)
        self._mats.append((len(faces), mat_type, albedo, fuzz, ior, emission))
        self._nv += len(vertices)
        return self

    def add_quad(self, corner, edge_u, edge_v, **mat) -> "MeshBuilder":
        """Parallelogram (corner, corner+u, corner+u+v, corner+v) as 2 tris;
        geometric normal = normalize(u x v)."""
        c = np.asarray(corner, np.float64)
        u = np.asarray(edge_u, np.float64)
        v = np.asarray(edge_v, np.float64)
        verts = np.stack([c, c + u, c + u + v, c + v])
        faces = np.array([[0, 1, 2], [0, 2, 3]])
        return self.add_triangles(verts, faces, **mat)

    def add_box(self, center, size, rotate_y: float = 0.0, **mat) -> "MeshBuilder":
        """Axis-aligned box (optionally rotated about +y), 12 tris,
        outward normals."""
        cx, cy, cz = np.asarray(center, np.float64)
        sx, sy, sz = np.asarray(size, np.float64) / 2.0
        corners = np.array([[x, y, z]
                            for x in (-sx, sx) for y in (-sy, sy)
                            for z in (-sz, sz)])
        if rotate_y:
            a = np.deg2rad(rotate_y)
            rot = np.array([[np.cos(a), 0, np.sin(a)],
                            [0, 1, 0],
                            [-np.sin(a), 0, np.cos(a)]])
            corners = corners @ rot.T
        corners += np.array([cx, cy, cz])
        # index bits: x*4 + y*2 + z; quads with outward winding
        quads = [(0, 1, 3, 2), (4, 6, 7, 5),    # -x, +x
                 (0, 4, 5, 1), (2, 3, 7, 6),    # -y, +y
                 (0, 2, 6, 4), (1, 5, 7, 3)]    # -z, +z
        faces = []
        for q in quads:
            faces += [[q[0], q[1], q[2]], [q[0], q[2], q[3]]]
        return self.add_triangles(corners, np.array(faces), **mat)

    def build(self, max_leaf: int = 4, builder: str = "auto") -> TriangleMesh:
        if not self._faces:
            raise ValueError("mesh has no triangles")
        verts = np.concatenate(self._verts)
        faces = np.concatenate(self._faces)

        def expand(field: int, width):
            parts = []
            for cnt, *mats in self._mats:
                shape = (cnt,) if width is None else (cnt, width)
                row = np.asarray(mats[field], np.float64).reshape(
                    (1,) if width is None else (1, width))
                parts.append(np.broadcast_to(row, shape))
            return np.concatenate(parts)

        return build_mesh(
            verts, faces,
            mat_type=expand(0, None).astype(np.int32),
            albedo=expand(1, 3), fuzz=expand(2, None), ior=expand(3, None),
            emission=expand(4, 3), max_leaf=max_leaf, builder=builder)


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
