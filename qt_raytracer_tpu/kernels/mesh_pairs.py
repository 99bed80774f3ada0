"""Pallas TPU kernel: pair-wavefront triangle-mesh closest hit.

The clustered sweep (mesh_intersect.py) gates cluster visits by the UNION
over each 128-ray group: the measured per-RAY box-crossing count on the
100k-tri terrain is ~1.7, yet sorted groups still visit ~42 clusters — a
~25x granularity waste (docs/PERFORMANCE.md speed-of-light section calls
this the frontier). This module removes the union entirely by turning the
traversal inside out, the TPU analog of a GPU ray-queue:

  1. XLA prologue: slab-test every (ray, cluster) pair against the
     sphere-capped slack bound (the exact per-lane gate the clustered
     kernel applies on its first block) and EMIT the crossing pairs with
     `jnp.nonzero(size=...)` — static shapes, pair budget ~4N.
  2. Group pairs CLUSTER-major, each cluster's pair list padded to a
     multiple of 128, and gather each pair's ray data with ONE packed
     row-gather ([N,8] table: origin, direction, t-cap).
  3. Kernel: every 128-pair tile belongs to ONE cluster (id scalar-
     prefetched per tile); Möller-Trumbore runs as (128 rays, 128 tris)
     tiles over just that cluster's CLUSTER_ROWS rows — every visit is
     productive, no union waste, no in-kernel gating at all.
  4. XLA epilogue: per-ray min over pairs via scatter-min, ties broken by
     lowest global triangle id (bitwise the clustered kernel's rule:
     ascending-cluster strict-< then lowest-gid-within-cluster).

Pair-budget overflow (pathological crossing counts) never corrupts the
image: `jnp.nonzero` drops the HIGHEST ray ids first, so rays >= the last
fully-kept ray are re-run through the clustered kernel via its alive mask
(all-false in the common case: its sort packs dead rays into skipped
groups, leaving only grid overhead).

Results are bitwise identical to mesh_search_pallas for live lanes under
the same conservativeness contract its cap pruning already relies on
(slab slack covers slab-vs-MT rounding divergence); enforced by
tests/test_mesh_pairs.py. Outputs are detached; differentiable quantities
are re-derived by the caller (core/world.py _tri_t_diff).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..accel.mesh import TriangleMesh
from .mesh_intersect import (BIG, CLUSTER_ROWS, GROUPS, LANE,
                             mesh_search_pallas, num_clusters,
                             prep_mesh_clusters)


def _pairs_kernel(gmap, ox, oy, oz, dx, dy, dz, tcap, valid,
                  v0x, v0y, v0z, e1x, e1y, e1z, e2x, e2y, e2z,
                  t_out, idx_out, *, t_min: float, num_tris: int):
    """One grid step = GROUPS 128-pair tiles; tile g's cluster id comes
    from the prefetched gmap. Möller-Trumbore math is copied verbatim from
    mesh_intersect.visit_vpu so per-(ray, tri) f32 results match bitwise."""
    tcol = lambda row: jnp.transpose(row, (1, 0))       # (1,128) -> (128,1)
    step = pl.program_id(0)

    for grp in range(GROUPS):
        row_alive = jnp.sum(valid[grp:grp + 1, :]) > 0

        @pl.when(row_alive)
        def _(grp=grp):
            c = gmap[step * GROUPS + grp]
            o = tuple(tcol(comp[grp:grp+1, :]) for comp in (ox, oy, oz))
            d = tuple(tcol(comp[grp:grp+1, :]) for comp in (dx, dy, dz))
            valid_col = tcol(valid[grp:grp+1, :]) != 0
            cap_col = jnp.where(valid_col, tcol(tcap[grp:grp+1, :]), BIG)

            t_best = cap_col                              # (128, 1)
            idx_best = jnp.zeros((128, 1), jnp.int32)
            row_base = c * CLUSTER_ROWS
            for sub in range(CLUSTER_ROWS):
                row = row_base + sub
                v0 = (v0x[pl.ds(row, 1), :], v0y[pl.ds(row, 1), :],
                      v0z[pl.ds(row, 1), :])              # (1, 128) tris
                e1 = (e1x[pl.ds(row, 1), :], e1y[pl.ds(row, 1), :],
                      e1z[pl.ds(row, 1), :])
                e2 = (e2x[pl.ds(row, 1), :], e2y[pl.ds(row, 1), :],
                      e2z[pl.ds(row, 1), :])

                def cross(a, b):
                    return (a[1] * b[2] - a[2] * b[1],
                            a[2] * b[0] - a[0] * b[2],
                            a[0] * b[1] - a[1] * b[0])

                def dot3(a, b):
                    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]

                pv = cross(d, e2)
                det = dot3(pv, e1)
                ok_det = jnp.abs(det) > 1e-12
                inv_det = jnp.where(ok_det, 1.0, 0.0) / jnp.where(
                    ok_det, det, 1.0)
                s = (o[0] - v0[0], o[1] - v0[1], o[2] - v0[2])
                u = dot3(s, pv) * inv_det
                qv = cross(s, e1)
                v = dot3(qv, d) * inv_det
                t = dot3(qv, e2) * inv_det
                ok = (ok_det & (u >= 0.0) & (v >= 0.0)
                      & (u + v <= 1.0) & (t >= t_min) & (t < t_best))
                tcand = jnp.where(ok, t, BIG)
                tmin_c = jnp.min(tcand, axis=1, keepdims=True)
                lanes = jax.lax.broadcasted_iota(jnp.int32, tcand.shape, 1)
                gid = row * LANE + lanes
                idx_c = jnp.min(
                    jnp.where(tcand == tmin_c, gid, num_tris),
                    axis=1, keepdims=True)
                better = tmin_c < t_best
                t_best = jnp.where(better, tmin_c, t_best)
                idx_best = jnp.where(
                    better, jnp.where(idx_c >= num_tris, 0, idx_c),
                    idx_best)

            won = t_best < cap_col
            t_out[grp:grp+1, :] = jnp.transpose(
                jnp.where(won, t_best, BIG), (1, 0))
            idx_out[grp:grp+1, :] = jnp.transpose(
                jnp.where(won, idx_best, 0), (1, 0))

        @pl.when(jnp.logical_not(row_alive))
        def _(grp=grp):
            t_out[grp:grp+1, :] = jnp.full((1, LANE), BIG, jnp.float32)
            idx_out[grp:grp+1, :] = jnp.zeros((1, LANE), jnp.int32)


def cluster_bounds(mesh: TriangleMesh):
    """Unpadded cluster AABBs [k,3] — the same epsilon-padded boxes
    prep_mesh_clusters packs lane-dense (kept in one place so the emission
    gate and the clustered kernel's phase-1 gate test identical geometry)."""
    p = mesh.v0.shape[0]
    g = CLUSTER_ROWS * LANE
    k = num_clusters(p)
    p_pad = k * g

    def pad_tri(x, fill):
        return jnp.pad(x, ((0, p_pad - p), (0, 0)), constant_values=fill)

    v0 = pad_tri(mesh.v0, 1.0e9)
    e1 = pad_tri(mesh.e1, 0.0)
    e2 = pad_tri(mesh.e2, 0.0)
    va = v0.reshape(k, g, 3)
    vb = (v0 + e1).reshape(k, g, 3)
    vc = (v0 + e2).reshape(k, g, 3)
    lo = jnp.minimum(jnp.minimum(va.min(1), vb.min(1)), vc.min(1))
    hi = jnp.maximum(jnp.maximum(va.max(1), vb.max(1)), vc.max(1))
    span = jnp.max(jnp.max(mesh.v0, axis=0) - jnp.min(mesh.v0, axis=0))
    eps = 1e-5 * jnp.maximum(span, 1e-3)
    return lo - eps, hi + eps, k


@functools.partial(jax.jit,
                   static_argnames=("t_min", "interpret", "pair_budget"))
def mesh_search_pairs(mesh: TriangleMesh, origins, directions,
                      t_min: float, interpret: bool = False, alive=None,
                      t_cap=None, pair_budget: int = 0):
    """Closest-hit over the mesh: (t [N] f32 BIG=miss, tri_idx [N] i32),
    detached — drop-in for mesh_search_pallas (same sphere-cap semantics:
    a lane reports a mesh hit only when a triangle strictly beats t_cap).

    pair_budget: static (ray, cluster) pair capacity; 0 -> ~4 pairs/ray
    (terrain measures ~1.7 crossings/ray after cap pruning). Overflow rays
    fall back to the clustered kernel, so the budget trades speed, never
    correctness."""
    origins = jax.lax.stop_gradient(origins)
    directions = jax.lax.stop_gradient(directions)
    mesh = jax.lax.stop_gradient(mesh)
    n = origins.shape[0]
    num_tris = mesh.num_triangles

    alive_b = (jnp.ones((n,), bool) if alive is None
               else jax.lax.stop_gradient(alive).astype(bool))
    tcap = (jnp.full((n,), BIG, jnp.float32) if t_cap is None
            else jax.lax.stop_gradient(t_cap))

    lo, hi, k = cluster_bounds(mesh)
    if pair_budget <= 0:
        pair_budget = 4 * n
    p_cap = min(max(-(-pair_budget // 1024) * 1024, 1024), n * k)

    # --- 1. emission: per-(ray, cluster) slab test against the slacked
    # sphere cap (identical formula to the clustered kernel's first-block
    # gate, so emitted pairs are a superset of every visit it would make).
    # The mask is built CLUSTER-major ([k, N]) so nonzero's ascending flat
    # indices come out already grouped by cluster — no argsort needed.
    inv = 1.0 / jnp.where(jnp.abs(directions) < 1e-30,
                          jnp.where(directions < 0, -1e-30, 1e-30),
                          directions)
    cap_gate = jnp.minimum(tcap * 1.0001 + 1e-4, 1.0e37)
    enter = jnp.full((k, n), t_min, jnp.float32)
    exit_ = jnp.full((k, n), BIG, jnp.float32)
    for a in range(3):
        t0 = (lo[:, a:a+1] - origins[None, :, a]) * inv[None, :, a]
        t1 = (hi[:, a:a+1] - origins[None, :, a]) * inv[None, :, a]
        enter = jnp.maximum(enter, jnp.minimum(t0, t1))
        exit_ = jnp.minimum(exit_, jnp.maximum(t0, t1))
    mask = (exit_ > enter) & (enter <= cap_gate[None, :]) & alive_b[None, :]

    flat = mask.reshape(-1)
    (pidx,) = jnp.nonzero(flat, size=p_cap, fill_value=n * k)
    clus = pidx // n
    ray = pidx - clus * n
    valid = pidx < n * k
    npairs = jnp.sum(flat.astype(jnp.int32))
    # Overflow drops the highest CLUSTERS first (cluster-major ids): any
    # ray crossing a cluster >= the last kept one may be incomplete and is
    # re-run through the clustered kernel below.
    c_last = jnp.where(npairs > p_cap, clus[p_cap - 1], k)
    unsafe = jnp.any(
        mask & (jnp.arange(k, dtype=jnp.int32)[:, None] >= c_last), axis=0)

    # --- 2. pack each cluster's pairs into 128-lane-padded slots.
    # B >= p_cap + 128*k guarantees the padded total always fits.
    b_tot = -(-(p_cap + LANE * k) // (GROUPS * LANE)) * (GROUPS * LANE)
    ng = b_tot // LANE
    vi = valid.astype(jnp.int32)
    cidx = jnp.clip(clus, 0, k - 1)
    counts = jnp.zeros((k,), jnp.int32).at[cidx].add(vi)
    cum = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts)[:-1]])
    padded = -(-counts // LANE) * LANE
    pstart = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(padded)[:-1]])

    rank = jnp.arange(p_cap, dtype=jnp.int32) - cum[cidx]
    slot = jnp.where(valid, pstart[cidx] + rank, b_tot)
    ray_buf = jnp.full((b_tot,), -1, jnp.int32).at[slot].set(
        ray, mode="drop", unique_indices=True)
    gmap = jnp.zeros((ng,), jnp.int32).at[
        jnp.where(valid, slot // LANE, ng)].max(clus, mode="drop")

    # --- 3. one packed row-gather for each pair's ray data.
    table = jnp.concatenate(
        [origins, directions, tcap[:, None],
         jnp.zeros((n, 1), jnp.float32)], axis=1)        # [N, 8]
    gathered = table[jnp.clip(ray_buf, 0, n - 1)]        # [B, 8]
    plane = lambda j: gathered[:, j].reshape(ng, LANE)
    valid_plane = (ray_buf >= 0).astype(jnp.int32).reshape(ng, LANE)

    tri_planes, _, _, _, _, _ = prep_mesh_clusters(mesh)
    pr = tri_planes[0].shape[0]

    ray_spec = pl.BlockSpec((GROUPS, LANE), lambda i, gm: (i, 0),
                            memory_space=pltpu.VMEM)
    tri_spec = pl.BlockSpec((pr, LANE), lambda i, gm: (0, 0),
                            memory_space=pltpu.VMEM)
    nb = ng // GROUPS
    t_pair, idx_pair = pl.pallas_call(
        functools.partial(_pairs_kernel, t_min=t_min, num_tris=num_tris),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nb,),
            in_specs=[ray_spec] * 8 + [tri_spec] * 9,
            out_specs=(ray_spec, ray_spec),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((ng, LANE), jnp.float32),
            jax.ShapeDtypeStruct((ng, LANE), jnp.int32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=b_tot * CLUSTER_ROWS * LANE * 45,
            bytes_accessed=b_tot * 4 * 10 + pr * LANE * 9 * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(gmap, *[plane(j) for j in range(7)], valid_plane, *tri_planes)

    # --- 4. per-ray reduction: min t, ties -> lowest global triangle id
    # (the clustered kernel's ascending-cluster/lowest-gid rule).
    t_pair = t_pair.reshape(-1)
    idx_pair = idx_pair.reshape(-1)
    pvalid = (ray_buf >= 0) & (t_pair < BIG)
    rid = jnp.where(pvalid, ray_buf, n)
    tmin = jnp.full((n,), BIG, jnp.float32).at[rid].min(
        jnp.where(pvalid, t_pair, BIG), mode="drop")
    tie = pvalid & (t_pair == tmin[jnp.clip(rid, 0, n - 1)])
    imin = jnp.full((n,), num_tris, jnp.int32).at[rid].min(
        jnp.where(tie, idx_pair, num_tris), mode="drop")
    t_res = tmin
    i_res = jnp.where(imin < num_tris, imin, 0)

    # --- 5. overflow fallback through the clustered kernel. sort=False:
    # in the no-overflow common case the mask is ALL-false, every group is
    # dead and skipped, and the coherence sort would only add its
    # argsort+gather tax per call; genuine overflow (pathological crossing
    # counts) pays one unsorted sweep for the affected rays.
    t_fb, i_fb = mesh_search_pallas(
        mesh, origins, directions, t_min, interpret=interpret,
        alive=unsafe, t_cap=tcap, sort=False)
    t_res = jnp.where(unsafe, t_fb, t_res)
    i_res = jnp.where(unsafe, i_fb, i_res)
    return t_res, i_res
