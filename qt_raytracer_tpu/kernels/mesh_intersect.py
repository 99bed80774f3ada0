"""Pallas TPU kernel: clustered triangle-mesh closest hit.

Per-ray BVH pointer walks (accel/traverse.py) are hostile to TPUs: every
lockstep iteration gathers node data at ~2 ms per 256Ki rays and the whole
wavefront waits for its slowest lane. This kernel replaces the walk with a
cluster sweep shaped by Mosaic's actual constraints (no dynamic LANE
indexing; dynamic SUBLANE slices/reads are fine; (X,1) tiles are lane-padded
128x so bulk data must be lane-dense):

  layout:  rays  -> sublanes: each 128-ray group is transposed in-kernel to
               (128, 1) columns (cheap Mosaic relayout);
           triangles -> lanes: 9 dense [P/128, 128] component planes
               (~3.6 MB per 100k tris, VMEM-resident);
           clusters = G consecutive BVH-ordered (spatially coherent)
               triangles; AABBs as [K/128, 128] lane-dense planes.

  kernel, per 128-ray group:
      phase 1: slab-test ALL K cluster boxes as (128, 128) tiles;
          per-cluster hit popcounts into a (K, 1) scratch;
      phase 2: fori_loop over clusters in BVH-DFS order;
          pl.when(popcount > 0) skips untouched clusters; survivors run
          Möller-Trumbore as (128 rays, 128 tris) tiles with running
          min/argmin in (128, 1) scratch. (A front-to-back ordered variant
          with capped early exit measured slower — see the in-kernel note.)

Outputs are detached; differentiable quantities are re-derived by the caller
(core/world.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..accel.mesh import TriangleMesh

import os

BIG = 3.0e38
LANE = 128
SUBLANE = 8
GROUPS = 8                 # 128-ray groups per grid step (1024 rays)
# 128-tri rows per cluster (G = rows*128 triangles). Tunable for experiments
# via QTRT_CLUSTER_ROWS; 4 measured best at first, see PERFORMANCE.md.
CLUSTER_ROWS = int(os.environ.get("QTRT_CLUSTER_ROWS", "4"))
# Visit tiling: "subtile" (default) runs Möller-Trumbore on (8 rays, 128
# tris) single-vreg tiles — 16 sublane slices per 128-ray group. The
# (128,128) formulation ("full") keeps ~12 live (128,128) intermediates
# (16 vregs each) through the MT chain, far beyond the vreg file, so Mosaic
# spills to VMEM every visit; the (8,128) slices keep every intermediate in
# ONE vreg and make the ray-side broadcast a single-op lane broadcast.
# Identical per-(ray,tri) expression tree and the same 128-lane min/argmin
# -> bitwise-identical outputs (tested: tests/test_mesh_kernel.py).
VISIT_MODE = os.environ.get("QTRT_MESH_VISIT", "full")
# Sub-tile height (rays per MT slice) for visit="subtile". MEASURED (v5e,
# terrain, 414Ki crossing-sorted random rays): 8 -> 360 ms (3x WORSE than
# full: per-op issue overhead dominates at 1 vreg/op), so larger slices.
SUBTILE_ROWS = int(os.environ.get("QTRT_MESH_SUBTILE", "32"))
# Möller-Trumbore engine: "vpu" (default) is the elementwise formulation;
# "mxu" computes det/U/V/T as rank-<=6 bilinear forms with four
# [128,q]@[q,128] MXU matmuls per tri row (precision HIGHEST). Same accept
# logic; candidates round differently (measure-zero edge flips — both
# validated against the XLA traversal in tests/test_mesh_kernel.py).
# MEASURED (v5e, terrain, 414Ki rays, sorted): mxu is SLOWER — random-ray
# batch 551 ms vs 360 ms — the f32-HIGHEST 6-pass decomposition plus
# per-row operand assembly outweighs the VPU op savings at K<=6. Kept as a
# tested variant; revisit if a bf16-candidate pass (PERFORMANCE.md roadmap)
# lands.
MT_MODE = os.environ.get("QTRT_MESH_MT", "vpu")
# Wavefront sort key family: "crossing" (first gated cluster id, default)
# or "crossing2" (first TWO gated cluster ids — finer grouping, one extra
# gate pass). Overridable per-call via mesh_search_pallas(sort_mode=...).
SORT_MODE = os.environ.get("QTRT_MESH_SORT", "crossing")
# Sort-pipeline mechanics: "fused" (default — ONE stable variadic lax.sort
# carrying every ray operand with the key, inverse by a second sort on the
# carried iota) or "gather" (argsort + per-operand random gathers + result
# scatters). Same stable permutation either way -> bitwise-identical
# outputs; only the data-movement primitive changes. Random gathers cost
# ~2-3.5 ms per 256Ki rows EACH while lax.sort streams all payloads through
# one sort network; MEASURED (v5e, terrain 414Ki-ray bounces,
# mesh_sort_cost.py round 5): 147-167 ms -> 87-128 ms per search, terrain
# 1080p frame 2.98 s -> 1.68 s (0.70 -> 1.24 Msamples/s). Import-time
# default; per-call override via mesh_search_pallas(pipe=...).
SORT_PIPE = os.environ.get("QTRT_MESH_SORT_PIPE", "fused")


def num_clusters(num_tris: int) -> int:
    """Static cluster count for a mesh of `num_tris` triangles — THE packing
    formula (shared by prep_mesh_clusters, the sort-skip check, and
    mesh_pairs.cluster_bounds so gate/skip logic can't drift from it)."""
    return max(-(-num_tris // (CLUSTER_ROWS * LANE)), 1)


def cluster_rows_for(num_tris: int) -> int:
    """Static Möller-Trumbore rows per cluster — THE companion packing
    formula (prep_mesh_clusters, both visit kernels, mesh_pairs). Full
    CLUSTER_ROWS for multi-cluster meshes; SINGLE-cluster meshes shrink to
    ceil(p/128) so a small mesh doesn't sweep rows of degenerate padding
    triangles: the 36-tri true Cornell packs into ONE row, and sweeping 4
    was 4x the MT work for identical results (padding tris have zero edges
    -> det 0 -> miss; tri ids stay the linear BVH-order index either way).
    Measured on v5e in docs/PERFORMANCE.md round 5 (QTRT_SMALL_MESH_ROWS=0
    opts out, for A/B only)."""
    if num_tris > CLUSTER_ROWS * LANE:
        return CLUSTER_ROWS
    if os.environ.get("QTRT_SMALL_MESH_ROWS", "1") == "0":
        return CLUSTER_ROWS
    return max(-(-num_tris // LANE), 1)


def prep_mesh_clusters(mesh: TriangleMesh):
    """Lane-dense packing. Returns (tri_planes [9 x (PR,128)],
    box_planes [6 x (KR,128)], centers [k,3], radii [k], k, k_pad)."""
    p = mesh.v0.shape[0]
    g = cluster_rows_for(p) * LANE
    k = num_clusters(p)
    p_pad = k * g
    k_pad = max(-(-k // LANE) * LANE, LANE)

    def pad_tri(x, fill):
        return jnp.pad(x, ((0, p_pad - p), (0, 0)), constant_values=fill)

    # Degenerate padding triangles: far away, zero edges -> det == 0 -> miss.
    v0 = pad_tri(mesh.v0, 1.0e9)
    e1 = pad_tri(mesh.e1, 0.0)
    e2 = pad_tri(mesh.e2, 0.0)

    va = v0.reshape(k, g, 3)
    vb = (v0 + e1).reshape(k, g, 3)
    vc = (v0 + e2).reshape(k, g, 3)
    lo = jnp.minimum(jnp.minimum(va.min(1), vb.min(1)), vc.min(1))  # [k,3]
    hi = jnp.maximum(jnp.maximum(va.max(1), vb.max(1)), vc.max(1))
    # Epsilon-pad cluster boxes (mirrors accel/mesh.build_mesh): coplanar
    # axis-aligned clusters are zero-thickness, which the kernel's strict
    # slab gate would never pass; padding keeps gating conservative. Scale
    # from the REAL vertices (padding triangles are parked at 1e9 and would
    # blow up a box-derived scale).
    span = jnp.max(jnp.max(mesh.v0, axis=0) - jnp.min(mesh.v0, axis=0))
    eps = 1e-5 * jnp.maximum(span, 1e-3)
    lo = lo - eps
    hi = hi + eps
    # Padding clusters carry their slot's degenerate far-away point, so their
    # boxes never intersect scene rays; still give them sane centers.
    centers = 0.5 * (lo + hi)
    radii = 0.5 * jnp.linalg.norm(hi - lo, axis=1)

    lo_p = jnp.pad(lo, ((0, k_pad - k), (0, 0)), constant_values=BIG)
    hi_p = jnp.pad(hi, ((0, k_pad - k), (0, 0)), constant_values=-BIG)

    plane = lambda a, i: a[:, i].reshape(-1, LANE)     # lane-dense
    tri_planes = [plane(v0, i) for i in range(3)] + \
                 [plane(e1, i) for i in range(3)] + \
                 [plane(e2, i) for i in range(3)]
    box_planes = [plane(lo_p, i) for i in range(3)] + \
                 [plane(hi_p, i) for i in range(3)]
    return tri_planes, box_planes, centers, radii, k, k_pad


def prep_row_boxes(mesh: TriangleMesh, p_pad: int):
    """Per-128-tri-ROW AABBs for the rowgate visit variant: 6 flat [PR] f32
    arrays (lo.xyz, hi.xyz), scalar-prefetched into SMEM so the kernel can
    read one row's box with a dynamic index. Same epsilon padding as the
    cluster boxes (conservative gating; padding rows never intersect)."""
    p = mesh.v0.shape[0]

    def pad_tri(x, fill):
        return jnp.pad(x, ((0, p_pad - p), (0, 0)), constant_values=fill)

    v0 = pad_tri(mesh.v0, 1.0e9)
    e1 = pad_tri(mesh.e1, 0.0)
    e2 = pad_tri(mesh.e2, 0.0)
    pr = p_pad // LANE
    va = v0.reshape(pr, LANE, 3)
    vb = (v0 + e1).reshape(pr, LANE, 3)
    vc = (v0 + e2).reshape(pr, LANE, 3)
    lo = jnp.minimum(jnp.minimum(va.min(1), vb.min(1)), vc.min(1))  # [pr,3]
    hi = jnp.maximum(jnp.maximum(va.max(1), vb.max(1)), vc.max(1))
    span = jnp.max(jnp.max(mesh.v0, axis=0) - jnp.min(mesh.v0, axis=0))
    eps = 1e-5 * jnp.maximum(span, 1e-3)
    lo = lo - eps
    hi = hi + eps
    return tuple(lo[:, a] for a in range(3)) + \
        tuple(hi[:, a] for a in range(3))


def build_mt_features(mesh: TriangleMesh, p_pad: int):
    """Per-triangle bilinear-form factors for the MXU Möller-Trumbore.

    With m = o×d, the four MT numerators separate into ray-side × tri-side
    contractions (scalar-triple-product identities, verified in
    tests/test_mesh_kernel.py):

        det    = d · (-n)                    n  = e1×e2 (unnormalized)
        U=u·det = m·e2 + d·c2                c2 = v0×e2
        V=v·det = m·(-e1) + d·(-c1)          c1 = v0×e1
        T=t·det = o·n + 1·(-v0·n)

    Stored row-interleaved for one dynamic sublane slice per (row, quantity):
      fdet [PR*3,128]: -n          fU [PR*6,128]: e2, c2
      fV   [PR*6,128]: -e1, -c1    fT [PR*4,128]: n, -v0·n
    Padding triangles have e1=e2=0 -> n=0 -> det=0 -> rejected.
    """
    p = mesh.v0.shape[0]

    def pad(x, fill=0.0):
        return jnp.pad(x, ((0, p_pad - p), (0, 0)), constant_values=fill)

    v0 = pad(mesh.v0)
    e1 = pad(mesh.e1)
    e2 = pad(mesh.e2)
    n = jnp.cross(e1, e2)
    c1 = jnp.cross(v0, e1)
    c2 = jnp.cross(v0, e2)
    v0n = jnp.sum(v0 * n, axis=1, keepdims=True)

    def interleave(parts):
        # [p_pad, q] -> [PR*q, 128]: row r's q factor rows are contiguous.
        q = parts.shape[1]
        return jnp.transpose(parts.reshape(-1, LANE, q), (0, 2, 1)) \
            .reshape(-1, LANE)

    fdet = interleave(-n)
    f_u = interleave(jnp.concatenate([e2, c2], axis=1))
    f_v = interleave(jnp.concatenate([-e1, -c1], axis=1))
    f_t = interleave(jnp.concatenate([n, -v0n], axis=1))
    return fdet, f_u, f_v, f_t


def _mesh_kernel_rowgate(rlx, rly, rlz, rhx, rhy, rhz, *args, **kw):
    """Scalar-prefetch wrapper: the 6 SMEM row-box refs come first."""
    _mesh_kernel(*args, row_boxes=(rlx, rly, rlz, rhx, rhy, rhz), **kw)


def _mesh_kernel(ox, oy, oz, dx, dy, dz, alive, tcap, *rest,
                 t_min: float, num_clusters: int, num_tris: int,
                 k_rows: int, mt_mode: str, visit_mode: str = VISIT_MODE,
                 row_boxes=None, has_excl: bool = False,
                 cluster_rows: int = CLUSTER_ROWS):
    # Optional per-lane excluded-triangle id (-1 = none): one extra ray
    # operand, compiled in only when present (the edge-aware background
    # re-trace for mesh worlds, diff/edge.py).
    excl_ref = None
    if has_excl:
        excl_ref, rest = rest[0], rest[1:]
    if mt_mode == "mxu":
        (fdet, f_u, f_v, f_t,
         blox, bloy, bloz, bhix, bhiy, bhiz,
         t_out, idx_out, enters_ref, counts_ref, tb_ref, ib_ref,
         counts_sl_ref) = rest
    else:
        (v0x, v0y, v0z, e1x, e1y, e1z, e2x, e2y, e2z,
         blox, bloy, bloz, bhix, bhiy, bhiz,
         t_out, idx_out, enters_ref, counts_ref, tb_ref, ib_ref,
         counts_sl_ref) = rest
    tcol = lambda row: jnp.transpose(row, (1, 0))      # (1,128) -> (128,1)

    for grp in range(GROUPS):
        row_alive = jnp.sum(alive[grp:grp + 1, :]) > 0

        @pl.when(row_alive)
        def _(grp=grp):
            o = tuple(tcol(c[grp:grp+1, :]) for c in (ox, oy, oz))  # (128,1)
            d = tuple(tcol(c[grp:grp+1, :]) for c in (dx, dy, dz))
            alive_col = tcol(alive[grp:grp+1, :]) != 0              # (128,1)
            excl_col = (tcol(excl_ref[grp:grp+1, :])
                        if excl_ref is not None else None)          # (128,1)
            inv = tuple(1.0 / jnp.where(jnp.abs(c) < 1e-30,
                                        jnp.where(c < 0, -1e-30, 1e-30), c)
                        for c in d)

            # Phase 1: cluster slab tests, 128 clusters (lanes) at a time.
            # Store each lane's ENTRY distance per cluster (BIG when the box
            # is missed or the lane is dead): phase 2 uses it as an exact
            # per-lane cap — a cluster whose entry exceeds a lane's running
            # t_best cannot improve that lane.
            for kr in range(k_rows):
                blo = (blox[kr:kr+1, :], bloy[kr:kr+1, :], bloz[kr:kr+1, :])
                bhi = (bhix[kr:kr+1, :], bhiy[kr:kr+1, :], bhiz[kr:kr+1, :])
                enter = jnp.full((128, LANE), t_min, jnp.float32)
                exit_ = jnp.full((128, LANE), BIG, jnp.float32)
                for a in range(3):
                    t0 = (blo[a] - o[a]) * inv[a]       # (128, 128)
                    t1 = (bhi[a] - o[a]) * inv[a]
                    enter = jnp.maximum(enter, jnp.minimum(t0, t1))
                    exit_ = jnp.minimum(exit_, jnp.maximum(t0, t1))
                mask = (exit_ > enter) & alive_col
                enters_ref[:, kr * LANE:(kr + 1) * LANE] = jnp.where(
                    mask, enter, BIG)                    # (rays, clusters)

            # Per-lane initial cap: the closest SPHERE hit (BIG when none).
            # Mirrors the oracle's sphere-capped mesh query
            # (testing/oracle.py _trace_one: t_max = sphere t) and prunes
            # every cluster beyond the sphere winner from the first block —
            # on the terrain most downward rays hit the ground sphere.
            cap_col = jnp.where(alive_col, tcol(tcap[grp:grp+1, :]), BIG)
            tb_ref[...] = cap_col
            ib_ref[...] = jnp.zeros((128, 1), jnp.int32)

            if mt_mode == "mxu":
                # Ray-side factor matrices, built ONCE per group: the MT
                # numerators are bilinear in (ray features) x (tri features)
                # — see build_mt_features. K<=6 underfills the MXU but still
                # beats the VPU broadcast formulation ~4x per visit.
                mx = o[1] * d[2] - o[2] * d[1]          # m = o x d, (128,1)
                my = o[2] * d[0] - o[0] * d[2]
                mz = o[0] * d[1] - o[1] * d[0]
                r6 = jnp.concatenate([mx, my, mz, d[0], d[1], d[2]], axis=1)
                r3 = jnp.concatenate([d[0], d[1], d[2]], axis=1)
                r4 = jnp.concatenate(
                    [o[0], o[1], o[2], jnp.ones((128, 1), jnp.float32)],
                    axis=1)
                hi_prec = jax.lax.Precision.HIGHEST
                dims = (((1,), (0,)), ((), ()))

                def mm(a, b):
                    return jax.lax.dot_general(
                        a, b, dims, precision=hi_prec,
                        preferred_element_type=jnp.float32)

            def visit_mxu(c):
                """MXU Möller-Trumbore over cluster c's cluster_rows rows."""
                row_base = c * cluster_rows
                t_best = tb_ref[...]                    # (128, 1)
                idx_best = ib_ref[...]
                for sub in range(cluster_rows):
                    row = row_base + sub
                    det = mm(r3, fdet[pl.ds(row * 3, 3), :])   # (128, 128)
                    uu = mm(r6, f_u[pl.ds(row * 6, 6), :])
                    vv = mm(r6, f_v[pl.ds(row * 6, 6), :])
                    tt = mm(r4, f_t[pl.ds(row * 4, 4), :])
                    ok_det = jnp.abs(det) > 1e-12
                    inv_det = jnp.where(ok_det, 1.0, 0.0) / jnp.where(
                        ok_det, det, 1.0)
                    u = uu * inv_det
                    v = vv * inv_det
                    t = tt * inv_det
                    ok = (ok_det & (u >= 0.0) & (v >= 0.0)
                          & (u + v <= 1.0) & (t >= t_min) & (t < t_best))
                    lanes = jax.lax.broadcasted_iota(jnp.int32, ok.shape, 1)
                    gid = row * LANE + lanes
                    if excl_col is not None:
                        ok = ok & (gid != excl_col)
                    tcand = jnp.where(ok, t, BIG)
                    tmin_c = jnp.min(tcand, axis=1, keepdims=True)
                    idx_c = jnp.min(
                        jnp.where(tcand == tmin_c, gid, num_tris),
                        axis=1, keepdims=True)
                    better = tmin_c < t_best
                    t_best = jnp.where(better, tmin_c, t_best)
                    idx_best = jnp.where(
                        better, jnp.where(idx_c >= num_tris, 0, idx_c),
                        idx_best)
                tb_ref[...] = t_best
                ib_ref[...] = idx_best

            def visit_vpu(c):
                """Möller-Trumbore over cluster c's cluster_rows tri rows."""
                row_base = c * cluster_rows
                t_best = tb_ref[...]                    # (128, 1)
                idx_best = ib_ref[...]
                for sub in range(cluster_rows):
                    row = row_base + sub
                    v0 = (v0x[pl.ds(row, 1), :], v0y[pl.ds(row, 1), :],
                          v0z[pl.ds(row, 1), :])        # (1, 128) tris
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

                    # (128 rays, 128 tris) Möller-Trumbore.
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
                    lanes = jax.lax.broadcasted_iota(jnp.int32, ok.shape, 1)
                    gid = row * LANE + lanes
                    if excl_col is not None:
                        ok = ok & (gid != excl_col)
                    tcand = jnp.where(ok, t, BIG)
                    tmin_c = jnp.min(tcand, axis=1, keepdims=True)
                    idx_c = jnp.min(
                        jnp.where(tcand == tmin_c, gid, num_tris),
                        axis=1, keepdims=True)
                    better = tmin_c < t_best
                    t_best = jnp.where(better, tmin_c, t_best)
                    idx_best = jnp.where(
                        better, jnp.where(idx_c >= num_tris, 0, idx_c),
                        idx_best)
                tb_ref[...] = t_best
                ib_ref[...] = idx_best

            def visit_sliced(c):
                """Slice-gated sub-tiled Möller-Trumbore.

                Rays are crossing-sorted, so a cluster's interested rays
                pack into a few consecutive lanes of the 128-ray group: gate
                each SUBTILE_ROWS-ray sublane slice on its own popcount
                (counts_sl_ref, built alongside the block caps) and skip
                slices with none. The gate is the same slack-padded
                conservative cap as the cluster gate, so skipped slices
                cannot contain a winner — outputs stay bitwise identical.
                """
                row_base = c * cluster_rows
                for s in range(128 // SUBTILE_ROWS):
                    @pl.when(counts_sl_ref[c, s] > 0)
                    def _(s=s):
                        lo_s = s * SUBTILE_ROWS
                        hi_s = lo_s + SUBTILE_ROWS
                        _mt_slice(row_base, lo_s, hi_s)

            def _mt_slice(row_base, lo_s, hi_s, rows=cluster_rows):
                o_s = tuple(v[lo_s:hi_s, :] for v in o)         # (R,1)
                d_s = tuple(v[lo_s:hi_s, :] for v in d)
                t_best = tb_ref[lo_s:hi_s, :]                   # (R,1)
                idx_best = ib_ref[lo_s:hi_s, :]
                for sub in range(rows):
                    row = row_base + sub
                    v0 = (v0x[pl.ds(row, 1), :], v0y[pl.ds(row, 1), :],
                          v0z[pl.ds(row, 1), :])                # (1, 128)
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

                    # (R rays, 128 tris) Möller-Trumbore.
                    pv = cross(d_s, e2)
                    det = dot3(pv, e1)
                    ok_det = jnp.abs(det) > 1e-12
                    inv_det = jnp.where(ok_det, 1.0, 0.0) / jnp.where(
                        ok_det, det, 1.0)
                    sv = (o_s[0] - v0[0], o_s[1] - v0[1], o_s[2] - v0[2])
                    u = dot3(sv, pv) * inv_det
                    qv = cross(sv, e1)
                    v = dot3(qv, d_s) * inv_det
                    t = dot3(qv, e2) * inv_det
                    ok = (ok_det & (u >= 0.0) & (v >= 0.0)
                          & (u + v <= 1.0) & (t >= t_min) & (t < t_best))
                    lanes = jax.lax.broadcasted_iota(
                        jnp.int32, ok.shape, 1)
                    gid = row * LANE + lanes
                    if excl_col is not None:
                        ok = ok & (gid != excl_col[lo_s:hi_s, :])
                    tcand = jnp.where(ok, t, BIG)
                    tmin_c = jnp.min(tcand, axis=1, keepdims=True)
                    idx_c = jnp.min(
                        jnp.where(tcand == tmin_c, gid, num_tris),
                        axis=1, keepdims=True)
                    better = tmin_c < t_best
                    t_best = jnp.where(better, tmin_c, t_best)
                    idx_best = jnp.where(
                        better, jnp.where(idx_c >= num_tris, 0, idx_c),
                        idx_best)
                tb_ref[lo_s:hi_s, :] = t_best
                ib_ref[lo_s:hi_s, :] = idx_best

            def visit_subtile(c):
                """Möller-Trumbore on (8 rays, 128 tris) sublane slices.

                Same expression tree per (ray, tri) pair and the same
                128-lane min/argmin as visit_vpu, so outputs are bitwise
                identical — but every intermediate is ONE vreg (the
                (128,128) formulation keeps ~12 16-vreg intermediates live,
                spilling to VMEM every visit) and the ray-side operand
                broadcast is a single-op (8,1) lane broadcast.
                """
                row_base = c * cluster_rows
                for s in range(128 // SUBTILE_ROWS):
                    lo_s = s * SUBTILE_ROWS
                    _mt_slice(row_base, lo_s, lo_s + SUBTILE_ROWS)

            def visit_rowgate(c):
                """Cluster visit with a per-128-tri-ROW AABB pre-gate.

                The cluster gate admits a whole CLUSTER_ROWS*128-tri group
                when ANY lane's slab entry beats its cap; row boxes (from
                SMEM scalar prefetch) are ~CLUSTER_ROWS x tighter, so rows
                no lane can improve on are skipped before their (128,128)
                Möller-Trumbore. Gate: same slack-padded conservative cap
                as the 32-block gate (t_best only shrinks during the visit,
                so a row that fails now can never pass later) — outputs
                stay bitwise identical to the plain sweep (tested).
                """
                rlx, rly, rlz, rhx, rhy, rhz = row_boxes
                row_base = c * cluster_rows
                for sub in range(cluster_rows):
                    row = row_base + sub
                    enter = jnp.full((128, 1), t_min, jnp.float32)
                    exit_ = jnp.full((128, 1), BIG, jnp.float32)
                    for a, (blo, bhi) in enumerate((
                            (rlx, rhx), (rly, rhy), (rlz, rhz))):
                        t0 = (blo[row] - o[a]) * inv[a]       # (128, 1)
                        t1 = (bhi[row] - o[a]) * inv[a]
                        enter = jnp.maximum(enter, jnp.minimum(t0, t1))
                        exit_ = jnp.minimum(exit_, jnp.maximum(t0, t1))
                    cap = jnp.minimum(tb_ref[...] * 1.0001 + 1e-4, 1.0e37)
                    hit_row = (exit_ > enter) & (enter <= cap) & alive_col

                    @pl.when(jnp.sum(hit_row.astype(jnp.int32)) > 0)
                    def _(row=row):
                        _mt_slice(row, 0, 128, rows=1)

            # Plain sweep in BVH-DFS order with popcount skipping.
            # MEASURED NOTE (v5e, 100k-tri terrain, 480x270 primary+bounce):
            # a front-to-back variant (per-group sorted cluster keys + capped
            # early exit via while_loop) was implemented and benchmarked at
            # 301-371 ms/frame vs 220 ms for this plain sweep — the ordered
            # indirection (dynamic order[] reads, per-check scalar reduces,
            # loop clamps) cost more than the pruning saved, because any
            # miss lane keeps the termination cap at its farthest box exit
            # (see git history for the implementation). Revisit only with
            # per-lane walk termination.
            if mt_mode == "mxu":
                visit = visit_mxu
            elif visit_mode == "sliced":
                visit = visit_sliced
            elif visit_mode == "subtile":
                visit = visit_subtile
            elif visit_mode == "rowgate":
                visit = visit_rowgate
            else:
                visit = visit_vpu

            def cluster_body(c, _):
                @pl.when(counts_ref[c, 0] > 0)
                def _():
                    visit(c)
                return 0

            # Per-lane distance cap, recomputed VECTORIZED once per
            # 32-cluster block (per-cluster vector gates inside the loop
            # measured 4x slower — scalarized loop work is deadly). A
            # cluster stays gated-in only while SOME lane's box-entry can
            # still beat that lane's running t_best (lagged by one block —
            # conservative). The cap carries ulp slack: slab entry and
            # Möller-Trumbore t are rounded differently in f32, so for
            # box-face-coincident triangles (tight hulls: every cluster has
            # some) the computed entry can exceed the computed winning t by
            # a few ulps — the slack keeps pruning strictly conservative,
            # so images stay bitwise identical to the plain sweep.
            CAP_BLOCK = 32
            for b0 in range(0, num_clusters, CAP_BLOCK):
                b1 = min(b0 + CAP_BLOCK, num_clusters)
                # Per-lane cap over THIS block's columns only (recomputing
                # all k_pad columns every block measured as a dominant fixed
                # cost: ~0.5 ms/group at k=196). (rays, blk) <= (rays, 1)
                # broadcast: natural layouts, no full-tile transposes.
                # Clamp the slacked cap BELOW the BIG miss sentinel: without
                # the clamp, a lane with t_best == BIG (no hit yet) gets cap
                # BIG*1.0001 > BIG, so its BIG-valued MISSED-box entries gate
                # every cluster back in — measured 967 ms for an all-sky
                # 414Ki-ray batch (every group visited every cluster) vs
                # ~5 ms with the clamp.
                cap = jnp.minimum(tb_ref[...] * 1.0001 + 1e-4, 1.0e37)
                ok = enters_ref[:, b0:b1] <= cap         # (128, blk)
                ok_i = ok.astype(jnp.int32)
                counts_row = jnp.sum(ok_i, axis=0, keepdims=True)  # (1, blk)
                if visit_mode == "sliced":
                    # Per-(cluster, sublane-slice) popcounts for the sliced
                    # visit's gate — same conservative cap, finer grain.
                    n_sl = 128 // SUBTILE_ROWS
                    counts_sl = jnp.sum(
                        ok_i.reshape(n_sl, SUBTILE_ROWS, b1 - b0), axis=1)

                # Whole-block skip: coherent (sorted) groups leave most
                # 32-cluster blocks empty — skip the scalar cluster loop
                # entirely, not just its visits.
                @pl.when(jnp.sum(counts_row) > 0)
                def _(b0=b0, b1=b1, counts_row=counts_row,
                      counts_sl=counts_sl if visit_mode == "sliced" else None):
                    counts_ref[b0:b1, :] = jnp.transpose(counts_row, (1, 0))
                    if visit_mode == "sliced":
                        counts_sl_ref[b0:b1, :] = jnp.transpose(
                            counts_sl, (1, 0))
                    jax.lax.fori_loop(b0, b1, cluster_body, 0)
            # A lane reports a MESH hit only if some triangle BEAT its
            # initial sphere cap (t < cap, same strict compare the caller's
            # sphere/mesh merge uses).
            tbv = tb_ref[...]
            won = tbv < cap_col
            t_out[grp:grp+1, :] = jnp.transpose(
                jnp.where(won, tbv, BIG), (1, 0))
            idx_out[grp:grp+1, :] = jnp.transpose(
                jnp.where(won, ib_ref[...], 0), (1, 0))

        @pl.when(jnp.logical_not(row_alive))
        def _(grp=grp):
            t_out[grp:grp+1, :] = jnp.full((1, LANE), BIG, jnp.float32)
            idx_out[grp:grp+1, :] = jnp.zeros((1, LANE), jnp.int32)


def _c1_kernel(ox, oy, oz, dx, dy, dz, alive, tcap,
               blox, bloy, bloz, bhix, bhiy, bhiz, c1_out, c2_out,
               *, t_min: float, num_clusters: int, k_rows: int,
               pair: bool):
    """Per-ray FIRST-CROSSED-CLUSTER id (num_clusters when none): the
    phase-1 slab test of _mesh_kernel reduced to an argmin — runs BEFORE
    the main kernel to build the crossing-set sort key. Same cap-slack
    gate as the emission/gating paths (sphere-capped, conservative).
    pair=True additionally emits the SECOND-lowest crossed cluster id
    (distinct from c1; num_clusters when none) for the two-level key."""
    tcol = lambda row: jnp.transpose(row, (1, 0))
    for grp in range(GROUPS):
        o = tuple(tcol(c[grp:grp+1, :]) for c in (ox, oy, oz))    # (128,1)
        d = tuple(tcol(c[grp:grp+1, :]) for c in (dx, dy, dz))
        alive_col = tcol(alive[grp:grp+1, :]) != 0
        cap_col = jnp.minimum(tcol(tcap[grp:grp+1, :]) * 1.0001 + 1e-4,
                              1.0e37)
        inv = tuple(1.0 / jnp.where(jnp.abs(c) < 1e-30,
                                    jnp.where(c < 0, -1e-30, 1e-30), c)
                    for c in d)

        def block_mask(kr):
            blo = (blox[kr:kr+1, :], bloy[kr:kr+1, :], bloz[kr:kr+1, :])
            bhi = (bhix[kr:kr+1, :], bhiy[kr:kr+1, :], bhiz[kr:kr+1, :])
            enter = jnp.full((128, LANE), t_min, jnp.float32)
            exit_ = jnp.full((128, LANE), BIG, jnp.float32)
            for a in range(3):
                t0 = (blo[a] - o[a]) * inv[a]
                t1 = (bhi[a] - o[a]) * inv[a]
                enter = jnp.maximum(enter, jnp.minimum(t0, t1))
                exit_ = jnp.minimum(exit_, jnp.maximum(t0, t1))
            mask = (exit_ > enter) & (enter <= cap_col) & alive_col
            cid = kr * LANE + jax.lax.broadcasted_iota(
                jnp.int32, mask.shape, 1)
            return mask, cid

        c1 = jnp.full((128, 1), num_clusters, jnp.int32)
        for kr in range(k_rows):
            mask, cid = block_mask(kr)
            row_min = jnp.min(jnp.where(mask, cid, num_clusters),
                              axis=1, keepdims=True)
            c1 = jnp.minimum(c1, row_min)
        c1_out[grp:grp+1, :] = jnp.transpose(c1, (1, 0))
        if pair:
            c2 = jnp.full((128, 1), num_clusters, jnp.int32)
            for kr in range(k_rows):
                mask, cid = block_mask(kr)
                row_min2 = jnp.min(
                    jnp.where(mask & (cid > c1), cid, num_clusters),
                    axis=1, keepdims=True)
                c2 = jnp.minimum(c2, row_min2)
            c2_out[grp:grp+1, :] = jnp.transpose(c2, (1, 0))
        else:
            c2_out[grp:grp+1, :] = jnp.zeros((1, LANE), jnp.int32)


# MEASURED REFUTATION (round 3, v5e, terrain 414Ki rays): a LIST-driven
# sweep — phase-1 gate hoisted to its own kernel, per-group dense visit
# lists built by an XLA argsort, MT in one fori_loop with VREG carries (no
# per-cluster branch, no per-visit scratch round trip) — ran 3.5x SLOWER
# than the lagged-cap sweep (510/505 ms vs 166/145 ms primary/random): the
# per-iteration dynamic scalar list read + non-unrolled fori_loop defeats
# Mosaic's pipelining, and the (k_pad,128)-padded list operand reads were
# additionally MISLOWERED on TPU (random-batch probe mismatch vs the
# bitwise-equal interpret run). Removed; implementation in git history
# (commit 6b81f93).


@functools.partial(jax.jit, static_argnames=("t_min", "interpret", "pair"))
def first_crossed_cluster(mesh: TriangleMesh, origins, directions,
                          t_min: float, alive=None, t_cap=None,
                          interpret: bool = False, pair: bool = False):
    """[N] i32: id of the first (lowest-id) cluster whose slacked,
    sphere-capped slab gate passes; k when none (dead rays -> k).
    pair=True returns (c1, c2): also the second-lowest distinct crossed
    cluster id (k when none) for the two-level crossing sort key."""
    oc, dc = _comps(origins), _comps(directions)
    n = oc[0].shape[0]
    tile = GROUPS * LANE
    n_pad = max(-(-n // tile) * tile, tile)
    nb = n_pad // tile

    def comp(x):
        return jnp.pad(x, (0, n_pad - n)).reshape(nb * GROUPS, LANE)

    rays = [comp(c) for c in oc] + [comp(c) for c in dc]
    if alive is None:
        rays.append(jnp.ones((nb * GROUPS, LANE), jnp.int32))
    else:
        rays.append(jnp.pad(alive.astype(jnp.int32), (0, n_pad - n))
                    .reshape(nb * GROUPS, LANE))
    if t_cap is None:
        rays.append(jnp.full((nb * GROUPS, LANE), BIG, jnp.float32))
    else:
        rays.append(jnp.pad(t_cap, (0, n_pad - n), constant_values=BIG)
                    .reshape(nb * GROUPS, LANE))

    _, box_planes, _, _, k, _ = prep_mesh_clusters(mesh)
    kr = box_planes[0].shape[0]
    ray_spec = pl.BlockSpec((GROUPS, LANE), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    box_spec = pl.BlockSpec((kr, LANE), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    c1, c2 = pl.pallas_call(
        functools.partial(_c1_kernel, t_min=t_min, num_clusters=k,
                          k_rows=kr, pair=pair),
        grid=(nb,),
        in_specs=[ray_spec] * 8 + [box_spec] * 6,
        out_specs=(ray_spec, ray_spec),
        out_shape=(jax.ShapeDtypeStruct((nb * GROUPS, LANE), jnp.int32),
                   jax.ShapeDtypeStruct((nb * GROUPS, LANE), jnp.int32)),
        interpret=interpret,
    )(*rays, *box_planes)
    if pair:
        return c1.reshape(-1)[:n], c2.reshape(-1)[:n]
    return c1.reshape(-1)[:n]


def _part1by2(x):
    """Spread the low 10 bits of x to every 3rd bit (Morton interleave)."""
    x = x & 0x3FF
    x = (x | (x << 16)) & 0x030000FF
    x = (x | (x << 8)) & 0x0300F00F
    x = (x | (x << 4)) & 0x030C30C3
    x = (x | (x << 2)) & 0x09249249
    return x


def _comps(x):
    """Normalize a ray array to flat components: [N,3] -> ([N],[N],[N]);
    tuples pass through (the flat-SoA integrator's zero-relayout path)."""
    if isinstance(x, (tuple, list)):
        return tuple(x)
    return (x[:, 0], x[:, 1], x[:, 2])


def sort_keys(origins, directions, alive, lo, hi):
    """Wavefront coherence sort key: (dead, origin Morton cell, direction
    octant). Dead rays sort LAST so they pack into all-dead 128-ray groups
    that the kernel's row_alive gate skips entirely (free compaction);
    origin locality dominates direction because nearby origins cross nearby
    cluster boxes. lo/hi: scene bounds (the BVH root box)."""
    oc, dc = _comps(origins), _comps(directions)
    ext = jnp.maximum(hi - lo, 1e-6)
    cell = [jnp.clip(((oc[a] - lo[a]) / ext[a] * 32.0).astype(jnp.int32),
                     0, 31) for a in range(3)]
    morton = (_part1by2(cell[0]) << 2) | (_part1by2(cell[1]) << 1) \
        | _part1by2(cell[2])
    octant = ((dc[0] < 0).astype(jnp.int32) * 4
              + (dc[1] < 0).astype(jnp.int32) * 2
              + (dc[2] < 0).astype(jnp.int32))
    # OCTANT-major, then origin Morton: measured best gate-union shrinkage
    # (terrain, 64Ki incoherent rays, 128-ray groups: unsorted 116.5 gated
    # clusters -> origin-major 79 -> octant-major 41.6; finer direction
    # quantization splits origin locality and REGRESSES: 2 bits/axis 55,
    # 3 bits/axis 84).
    key = (octant << 15) | morton
    if alive is not None:
        key = jnp.where(alive, key, jnp.int32(1 << 30))
    return key


def _scratch_shapes(k_pad):
    return [
        pltpu.VMEM((128, k_pad), jnp.float32),   # per-(ray,cluster) entry
        pltpu.VMEM((k_pad, 1), jnp.int32),       # gate counts (lagged cap)
        pltpu.VMEM((128, 1), jnp.float32),       # running t_best (col)
        pltpu.VMEM((128, 1), jnp.int32),         # running idx_best
        pltpu.VMEM((k_pad, 128 // SUBTILE_ROWS),
                   jnp.int32),                   # per-slice gate counts
    ]


@functools.partial(jax.jit,
                   static_argnames=("t_min", "interpret", "sort", "mt",
                                    "sort_mode", "visit", "pipe"))
def mesh_search_pallas(mesh: TriangleMesh, origins, directions,
                       t_min: float, interpret: bool = False, alive=None,
                       sort: bool = True, mt: str = MT_MODE, t_cap=None,
                       sort_mode: str = SORT_MODE, visit: str = VISIT_MODE,
                       exclude=None, pipe: str | None = None):
    """Closest-hit over the mesh: (t [N] f32 BIG=miss, tri_idx [N] i32),
    detached. tri_idx refers to the BVH-reordered triangle arrays.

    exclude: optional [N] i32 per-lane excluded triangle id (-1 = none),
    masked out of every visit's accept test — the edge-aware background
    re-trace for mesh worlds (diff/edge.py). One extra ray operand,
    compiled in only when present.

    pipe: sort-pipeline mechanics, "gather"/"fused" (None -> SORT_PIPE env
    default) — same permutation, different data-movement primitive; see
    the SORT_PIPE comment.

    sort=True reorders the wavefront by sort_keys before the kernel and
    scatters results back — per-ray outputs are BITWISE identical for LIVE
    lanes (each ray's Möller-Trumbore and min-reduce run in the lane
    dimension, independent of its neighbors); only the per-group
    cluster-gate unions change. Dead-lane outputs are unspecified in both
    modes (unsorted: a visited cluster may record a hit on a dead lane;
    sorted: dead rays pack into skipped groups and return BIG/0) — every
    caller masks hit consumption with `alive` (tested:
    tests/test_kernels.py). Measured (v5e, 100k-tri terrain, 414Ki
    incoherent rays): 116 -> 44 gated clusters per 128-ray group."""
    oc = tuple(jax.lax.stop_gradient(c) for c in _comps(origins))
    dc = tuple(jax.lax.stop_gradient(c) for c in _comps(directions))
    mesh = jax.lax.stop_gradient(mesh)

    n = oc[0].shape[0]
    perm = None
    # Single-cluster meshes (<= CLUSTER_ROWS*128 tris, e.g. the 36-tri true
    # Cornell box): the crossing key is CONSTANT and the gate union is the
    # one cluster no matter the order, so the whole sort pipeline (the
    # first_crossed_cluster gate pass + argsort + per-operand gathers +
    # result scatters) buys nothing — it measured 5.2x the single-visit
    # sweep itself on v5e (45.0 -> 8.7 ms per 414Ki rays, config-2 frame
    # 58.1 -> 12.4 s). Live-lane results are bitwise-identical either way
    # (see docstring); only dead-lane packing changes, which every caller
    # masks.
    k_static = num_clusters(mesh.v0.shape[0])
    if sort and n >= 2048 and k_static > 1:
        key = sort_keys(oc, dc,
                        None if alive is None else jax.lax.stop_gradient(alive),
                        mesh.bvh_min[0], mesh.bvh_max[0])
        if sort_mode == "crossing":
            # CROSSING-SET major key: group rays by the first cluster their
            # (sphere-capped) slab gate admits, Morton/octant as tiebreak —
            # the union a group gates in depends on the crossing sets
            # directly, and this key shrinks it far more than any
            # origin/direction proxy (measured, incoherent 414Ki terrain
            # batch: popcount union 41.4 -> 16.7 per 128-ray group;
            # benchmarks/mesh_gate_analysis.py). Live keys stay < 196*2^18
            # + 2^18, so the 2^30 dead marker still sorts dead rays last.
            c1 = first_crossed_cluster(
                mesh, oc, dc, t_min,
                alive=None if alive is None
                else jax.lax.stop_gradient(alive),
                t_cap=None if t_cap is None
                else jax.lax.stop_gradient(t_cap),
                interpret=interpret)
            key = c1 * jnp.int32(1 << 18) + key
        elif sort_mode == "crossing2":
            # Two-level crossing key (c1, c2): rays sharing their first TWO
            # crossed clusters pack together, shrinking the group gate union
            # below the c1-only key. Key layout (fits i32 for k <= 254):
            #   (c1*(k+1)+c2) * 2^15  |  octant(3)  |  morton 4 bits/axis.
            # Dead rays get INT32_MAX (sorts last).
            k_cl = prep_mesh_clusters(mesh)[4]
            c1, c2 = first_crossed_cluster(
                mesh, oc, dc, t_min,
                alive=None if alive is None
                else jax.lax.stop_gradient(alive),
                t_cap=None if t_cap is None
                else jax.lax.stop_gradient(t_cap),
                interpret=interpret, pair=True)
            lo = mesh.bvh_min[0]
            ext = jnp.maximum(mesh.bvh_max[0] - lo, 1e-6)
            cell = [jnp.clip(((oc[a] - lo[a]) / ext[a] * 16.0)
                             .astype(jnp.int32), 0, 15) for a in range(3)]
            m12 = ((_part1by2(cell[0]) << 2) | (_part1by2(cell[1]) << 1)
                   | _part1by2(cell[2])) & 0xFFF
            octant = ((dc[0] < 0).astype(jnp.int32) * 4
                      + (dc[1] < 0).astype(jnp.int32) * 2
                      + (dc[2] < 0).astype(jnp.int32))
            pair_key = c1 * jnp.int32(k_cl + 1) + c2
            key = pair_key * jnp.int32(1 << 15) + (octant << 12) + m12
            if alive is not None:
                key = jnp.where(jax.lax.stop_gradient(alive), key,
                                jnp.int32(2**31 - 1))
        if pipe is None:
            pipe = SORT_PIPE
        if pipe == "fused":
            # One stable variadic sort moves key + iota + every ray operand
            # together: O(#operands) random gathers become one streamed
            # sort network. Stable + iota tiebreak == jnp.argsort's exact
            # permutation, so outputs are bitwise-identical to the gather
            # pipe (tested: tests/test_mesh_kernel.py).
            ops = [key, jax.lax.iota(jnp.int32, n), *oc, *dc]
            if alive is not None:
                ops.append(jax.lax.stop_gradient(alive))
            if t_cap is not None:
                ops.append(jax.lax.stop_gradient(t_cap))
            if exclude is not None:
                ops.append(jax.lax.stop_gradient(exclude))
            s = list(jax.lax.sort(tuple(ops), dimension=0, num_keys=1,
                                  is_stable=True))
            perm = s[1]
            oc, dc = tuple(s[2:5]), tuple(s[5:8])
            pos = 8
            if alive is not None:
                alive = s[pos]
                pos += 1
            if t_cap is not None:
                t_cap = s[pos]
                pos += 1
            if exclude is not None:
                exclude = s[pos]
        else:
            perm = jnp.argsort(key)
            oc = tuple(c[perm] for c in oc)
            dc = tuple(c[perm] for c in dc)
            if alive is not None:
                alive = jax.lax.stop_gradient(alive)[perm]
            if t_cap is not None:
                t_cap = jax.lax.stop_gradient(t_cap)[perm]
            if exclude is not None:
                exclude = jax.lax.stop_gradient(exclude)[perm]

    tile = GROUPS * LANE
    n_pad = max(-(-n // tile) * tile, tile)
    nb = n_pad // tile

    def comp(x):
        return jnp.pad(x, (0, n_pad - n)).reshape(nb * GROUPS, LANE)

    rays = [comp(c) for c in oc] + [comp(c) for c in dc]
    if alive is None:
        alive_arr = jnp.ones((nb * GROUPS, LANE), jnp.int32)
    else:
        alive_arr = jnp.pad(
            jax.lax.stop_gradient(alive).astype(jnp.int32), (0, n_pad - n)
        ).reshape(nb * GROUPS, LANE)
    rays.append(alive_arr)
    if t_cap is None:
        tcap_arr = jnp.full((nb * GROUPS, LANE), BIG, jnp.float32)
    else:
        tcap_arr = jnp.pad(jax.lax.stop_gradient(t_cap),
                           (0, n_pad - n), constant_values=BIG
                           ).reshape(nb * GROUPS, LANE)
    rays.append(tcap_arr)
    has_excl = exclude is not None
    if has_excl:
        rays.append(jnp.pad(
            jax.lax.stop_gradient(exclude).astype(jnp.int32), (0, n_pad - n),
            constant_values=-1).reshape(nb * GROUPS, LANE))

    tri_planes, box_planes, centers, radii, k, k_pad = \
        prep_mesh_clusters(mesh)
    pr = tri_planes[0].shape[0]
    kr = box_planes[0].shape[0]
    c_rows = cluster_rows_for(mesh.v0.shape[0])

    if mt == "mxu":
        feats = build_mt_features(mesh, k * c_rows * LANE)
        tri_args = list(feats)
        tri_specs = [
            pl.BlockSpec((f.shape[0], LANE), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM) for f in feats]
    else:
        tri_args = list(tri_planes)
        tri_specs = [pl.BlockSpec((pr, LANE), lambda i, *_: (0, 0),
                                  memory_space=pltpu.VMEM)] * 9

    ray_spec = pl.BlockSpec((GROUPS, LANE), lambda i, *_: (i, 0),
                            memory_space=pltpu.VMEM)
    box_spec = pl.BlockSpec((kr, LANE), lambda i, *_: (0, 0),
                            memory_space=pltpu.VMEM)

    if visit == "rowgate":
        # Row boxes ride scalar prefetch (SMEM): dynamically indexable by
        # the in-visit row id, which VMEM lane-dense layouts cannot be.
        row_box_args = prep_row_boxes(mesh, k * c_rows * LANE)
        kern = functools.partial(_mesh_kernel_rowgate, t_min=t_min,
                                 num_clusters=k,
                                 num_tris=mesh.num_triangles, k_rows=kr,
                                 mt_mode=mt, visit_mode=visit,
                                 has_excl=has_excl, cluster_rows=c_rows)
        grid_kw = dict(grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=6,
            grid=(nb,),
            in_specs=[ray_spec] * len(rays) + tri_specs + [box_spec] * 6,
            out_specs=(ray_spec, ray_spec),
            scratch_shapes=_scratch_shapes(k_pad),
        ))
        extra_args = row_box_args
    else:
        kern = functools.partial(_mesh_kernel, t_min=t_min, num_clusters=k,
                                 num_tris=mesh.num_triangles, k_rows=kr,
                                 mt_mode=mt, visit_mode=visit,
                                 has_excl=has_excl, cluster_rows=c_rows)
        grid_kw = dict(
            grid=(nb,),
            in_specs=[ray_spec] * len(rays) + tri_specs + [box_spec] * 6,
            out_specs=(ray_spec, ray_spec),
            scratch_shapes=_scratch_shapes(k_pad),
        )
        extra_args = ()

    t, idx = pl.pallas_call(
        kern,
        **grid_kw,
        out_shape=(
            jax.ShapeDtypeStruct((nb * GROUPS, LANE), jnp.float32),
            jax.ShapeDtypeStruct((nb * GROUPS, LANE), jnp.int32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=n_pad * (k_pad * 20 + 45 * 4 * LANE),
            bytes_accessed=n_pad * 4 * 8 + pr * LANE * 9 * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*extra_args, *rays, *tri_args, *box_planes)

    t = jax.lax.stop_gradient(t.reshape(-1)[:n])
    idx = jax.lax.stop_gradient(idx.reshape(-1)[:n])
    if perm is not None:
        # Un-permute: sorted slot i holds ray perm[i]'s result.
        if pipe == "fused":
            # perm is a permutation of iota (all keys distinct), so sorting
            # by it is the exact inverse — one 2-payload sort instead of
            # two random scatters.
            _, t, idx = jax.lax.sort((perm, t, idx), dimension=0,
                                     num_keys=1, is_stable=False)
        else:
            t = jnp.zeros_like(t).at[perm].set(t, unique_indices=True,
                                               mode="drop")
            idx = jnp.zeros_like(idx).at[perm].set(idx, unique_indices=True,
                                                   mode="drop")
    return t, idx
