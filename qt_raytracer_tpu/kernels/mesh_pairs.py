"""Pallas TPU kernel: pair-wavefront triangle-mesh closest hit.

The clustered sweep (mesh_intersect.py) gates cluster visits by the UNION
over each 128-ray group: on the 100k-tri terrain, crossing-sorted groups
visit ~16 clusters where the per-ray crossing count is 1.7 (incoherent;
~13 vs 8.9 coherent) — up to ~10x of granularity waste on bounce
wavefronts (exact counts: docs/PERFORMANCE.md round-4 gate tables). This
module removes the union entirely by turning the traversal inside out,
the TPU analog of a GPU ray-queue:

  1. XLA prologue: slab-test every (ray, cluster) pair against the
     sphere-capped slack bound (the exact per-lane gate the clustered
     kernel applies on its first block) and extract each ray's ASCENDING
     crossing-cluster list with static width C via `lax.top_k` — no
     jnp.nonzero (measured 757 ms at [k*N]; top_k is ~11 ms).
  2. Group pairs CLUSTER-major with ONE stable `lax.sort` of the N*C
     (cluster, ray) records (~2 ms at 2M — the round-4 discovery that
     revived this path; see docs/PERFORMANCE.md round-4 tables), pad each
     cluster's run to a multiple of 128 via scatter+cummax slot maps, and
     gather each pair's ray data with ONE packed row-gather ([N,8] table:
     origin, direction, t-cap).
  3. Kernel: every 128-pair tile belongs to ONE cluster (id scalar-
     prefetched per tile); Möller-Trumbore runs as (128 rays, 128 tris)
     tiles over just that cluster's CLUSTER_ROWS rows — every visit is
     productive, no union waste, no in-kernel gating at all.
  4. XLA epilogue: per-ray min over pairs via scatter-min, ties broken by
     lowest global triangle id (bitwise the clustered kernel's rule:
     ascending-cluster strict-< then lowest-gid-within-cluster).

Per-ray crossing-list overflow (> C crossings) never corrupts the image:
those rays are re-run through the clustered kernel via its alive mask
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
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..accel.mesh import TriangleMesh
from .mesh_intersect import (BIG, CLUSTER_ROWS, GROUPS, LANE,
                             cluster_rows_for, mesh_search_pallas,
                             num_clusters, prep_mesh_clusters)


def _pairs_kernel(gmap, ox, oy, oz, dx, dy, dz, tcap, valid,
                  v0x, v0y, v0z, e1x, e1y, e1z, e2x, e2y, e2z,
                  t_out, idx_out, *, t_min: float, num_tris: int,
                  cluster_rows: int = CLUSTER_ROWS):
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
            row_base = c * cluster_rows
            for sub in range(cluster_rows):
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


def _clists_kernel(ox, oy, oz, dx, dy, dz, alive, tcap,
                   blox, bloy, bloz, bhix, bhiy, bhiz,
                   *outs, t_min: float, num_clusters: int,
                   k_rows: int, c_max: int):
    """Per-ray ascending crossed-cluster lists with static width c_max.

    Same slab/cap/alive gate bits as _c1_kernel (and the clustered
    kernel's phase-1), materialized ONCE per group into the (128, k_pad)
    scratch as cid-or-sentinel, then c_max cheap masked-min extraction
    passes. Replaces the XLA [N,k] mask + top_k prologue (measured ~46 ms
    per 414Ki rays; this kernel is ~5 ms)."""
    # Positional tail: c_max list outputs, the count output, the scratch.
    m_ref = outs[-1]
    n_out = outs[-2]
    c_outs = outs[:-2]
    tcol = lambda row: jnp.transpose(row, (1, 0))
    for grp in range(GROUPS):
        row_alive = jnp.sum(alive[grp:grp + 1, :]) > 0

        @pl.when(row_alive)
        def _(grp=grp):
            o = tuple(tcol(c[grp:grp+1, :]) for c in (ox, oy, oz))
            d = tuple(tcol(c[grp:grp+1, :]) for c in (dx, dy, dz))
            alive_col = tcol(alive[grp:grp+1, :]) != 0
            cap_col = jnp.minimum(
                tcol(tcap[grp:grp+1, :]) * 1.0001 + 1e-4, 1.0e37)
            inv = tuple(1.0 / jnp.where(jnp.abs(c) < 1e-30,
                                        jnp.where(c < 0, -1e-30, 1e-30), c)
                        for c in d)
            for kr in range(k_rows):
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
                m_ref[:, kr * LANE:(kr + 1) * LANE] = jnp.where(
                    mask, cid, num_clusters)

            stored = m_ref[...]                       # (128, k_pad)
            ncross = jnp.sum((stored < num_clusters).astype(jnp.int32),
                             axis=1, keepdims=True)
            n_out[grp:grp+1, :] = jnp.transpose(ncross, (1, 0))
            last = jnp.full((128, 1), -1, jnp.int32)
            for j in range(c_max):
                cj = jnp.min(jnp.where(stored > last, stored, num_clusters),
                             axis=1, keepdims=True)
                c_outs[j][grp:grp+1, :] = jnp.transpose(cj, (1, 0))
                last = cj

        @pl.when(jnp.logical_not(row_alive))
        def _(grp=grp):
            n_out[grp:grp+1, :] = jnp.zeros((1, LANE), jnp.int32)
            for j in range(c_max):
                c_outs[j][grp:grp+1, :] = jnp.full(
                    (1, LANE), num_clusters, jnp.int32)


def crossing_lists(mesh: TriangleMesh, origins, directions, t_min: float,
                   alive=None, t_cap=None, c_max: int = 4,
                   interpret: bool = False):
    """([N, c_max] i32 ascending crossed-cluster ids, k = none;
    [N] i32 crossing count) — the pair-wavefront emission, in-kernel.

    Gate bits match _c1_kernel / the clustered kernel's phase 1 (same
    eps-padded boxes from prep_mesh_clusters, same cap slack)."""
    from .mesh_intersect import _comps

    oc, dc = _comps(origins), _comps(directions)
    n = oc[0].shape[0]
    tile = GROUPS * LANE
    n_pad = max(-(-n // tile) * tile, tile)
    nb = n_pad // tile

    def comp(x, fill=0.0):
        return jnp.pad(x, (0, n_pad - n), constant_values=fill) \
            .reshape(nb * GROUPS, LANE)

    rays = [comp(c) for c in oc] + [comp(c) for c in dc]
    alive_f = (jnp.ones((n,), jnp.float32) if alive is None
               else alive.astype(jnp.float32))
    rays.append(comp(alive_f).astype(jnp.int32))   # padding rays dead (0)
    rays.append(comp(jnp.full((n,), BIG, jnp.float32), BIG) if t_cap is None
                else comp(t_cap, BIG))

    _, box_planes, _, _, k, k_pad = prep_mesh_clusters(mesh)
    kr = box_planes[0].shape[0]
    ray_spec = pl.BlockSpec((GROUPS, LANE), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    box_spec = pl.BlockSpec((kr, LANE), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_clists_kernel, t_min=t_min, num_clusters=k,
                          k_rows=kr, c_max=c_max),
        grid=(nb,),
        in_specs=[ray_spec] * 8 + [box_spec] * 6,
        out_specs=tuple([ray_spec] * (c_max + 1)),
        out_shape=tuple(
            jax.ShapeDtypeStruct((nb * GROUPS, LANE), jnp.int32)
            for _ in range(c_max + 1)),
        scratch_shapes=[pltpu.VMEM((128, kr * LANE), jnp.int32)],
        interpret=interpret,
    )(*rays, *box_planes)
    clus_nc = jnp.stack([o.reshape(-1)[:n] for o in out[:-1]], axis=1)
    ncross = out[-1].reshape(-1)[:n]
    return clus_nc, ncross


def cluster_bounds(mesh: TriangleMesh):
    """Unpadded cluster AABBs [k,3] — the same epsilon-padded boxes
    prep_mesh_clusters packs lane-dense (kept in one place so the emission
    gate and the clustered kernel's phase-1 gate test identical geometry)."""
    p = mesh.v0.shape[0]
    g = cluster_rows_for(p) * LANE
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

    pair_budget: static TOTAL (ray, cluster) pair capacity, interpreted as
    a per-ray crossing-list width of pair_budget // N (clamped to [1, k]);
    0 -> QTRT_PAIR_C (default 6) pairs/ray. Terrain measures ~1.7-2.0
    crossings/ray on bounce wavefronts, so a positive budget below ~2*N
    puts most rays on the clustered fallback. Rays with MORE than
    budget//N crossings fall back to the clustered kernel, so the budget
    trades speed, never correctness.

    Round-4 compaction (replaces the refuted jnp.nonzero/scatter pipeline,
    docs/PERFORMANCE.md): per-ray crossing lists with STATIC width C via
    top_k over the [N, k] slab mask, ONE stable sort of the N*C (cluster,
    ray) records into cluster-major order, and the padded-slot maps from a
    196-element scatter + cummax (searchsorted over B was measured 138 ms;
    sort at 2M is ~2 ms, benchmarks/compactor_probe.py). The pair order
    (ascending cluster, ray-ascending within) is IDENTICAL to the old
    nonzero emission, so kernel inputs and outputs are bitwise unchanged."""
    from .mesh_intersect import _comps

    oc = tuple(jax.lax.stop_gradient(c) for c in _comps(origins))
    dc = tuple(jax.lax.stop_gradient(c) for c in _comps(directions))
    mesh = jax.lax.stop_gradient(mesh)
    n = oc[0].shape[0]
    num_tris = mesh.num_triangles

    alive_b = (jnp.ones((n,), bool) if alive is None
               else jax.lax.stop_gradient(alive).astype(bool))
    tcap = (jnp.full((n,), BIG, jnp.float32) if t_cap is None
            else jax.lax.stop_gradient(t_cap))

    k = num_clusters(mesh.v0.shape[0])
    if pair_budget <= 0:
        # Crossing counts are long-tailed (terrain random wavefront: mean
        # 1.75 but 15% of rays exceed 4); C=6 cuts the overflow-fallback
        # population ~3x for ~35% more sort/gather glue.
        pair_budget = int(os.environ.get("QTRT_PAIR_C", "6")) * n
    c_max = min(max(pair_budget // n, 1), k)

    # --- 1. emission: per-ray ascending crossed-cluster lists from the
    # Pallas gate kernel (same slab/cap/alive gate bits as the clustered
    # kernel's phase 1 — identical eps-padded boxes and cap slack — so
    # emitted pairs are a superset of every visit it would make). The XLA
    # [N, k] mask + top_k formulation measured ~46 ms per 414Ki rays; the
    # kernel emission is ~5 ms (docs/PERFORMANCE.md round-4 tables).
    clus_nc, ncross = crossing_lists(
        mesh, oc, dc, t_min, alive=alive_b, t_cap=tcap,
        c_max=c_max, interpret=interpret)
    # A ray with more crossings than the static list width has an
    # INCOMPLETE pair list and is re-run through the clustered kernel.
    unsafe = ncross > c_max

    # --- 2. cluster-major grouping: one stable sort of the N*C records.
    # Stable + ray-major input => within each cluster, pairs stay
    # ray-ascending: exactly the old nonzero emission order.
    m_tot = n * c_max
    rid_nc = jnp.broadcast_to(
        jnp.arange(n, dtype=jnp.int32)[:, None], (n, c_max))
    clus_s, rid_s = jax.lax.sort(
        (clus_nc.reshape(-1), rid_nc.reshape(-1)), num_keys=1)

    # Per-cluster source starts/counts: searchsorted with k queries over
    # the sorted keys (the CHEAP direction; B-query searchsorted is not).
    qs = jnp.arange(k + 1, dtype=jnp.int32)
    bounds = jnp.searchsorted(clus_s, qs, side="left").astype(jnp.int32)
    cum = bounds[:-1]                                 # src start per cluster
    counts = bounds[1:] - cum
    padded = -(-counts // LANE) * LANE
    pstart = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(padded)[:-1]])

    # --- 3. padded-slot maps WITHOUT per-slot searchsorted: scatter each
    # cluster id at its padded start (ascending ids; empty clusters
    # collapse onto the next start and lose the max — correct), cummax
    # fills the slots.
    b_tot = -(-(m_tot + LANE * k) // (GROUPS * LANE)) * (GROUPS * LANE)
    ng = b_tot // LANE
    marks = jnp.zeros((b_tot,), jnp.int32).at[pstart].max(
        jnp.arange(k, dtype=jnp.int32), mode="drop")
    cmap = jax.lax.cummax(marks)                      # [B] cluster per slot
    off = jnp.arange(b_tot, dtype=jnp.int32) - pstart[cmap]
    validj = off < counts[cmap]
    src = jnp.clip(cum[cmap] + off, 0, m_tot - 1)
    ray_buf = jnp.where(validj, rid_s[src], -1)
    gmap = cmap.reshape(ng, LANE)[:, 0]

    # --- 3. one packed row-gather for each pair's ray data.
    table = jnp.stack(
        [*oc, *dc, tcap, jnp.zeros((n,), jnp.float32)], axis=1)  # [N, 8]
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
        functools.partial(_pairs_kernel, t_min=t_min, num_tris=num_tris,
                          cluster_rows=cluster_rows_for(mesh.v0.shape[0])),
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

    # --- 5. overflow fallback through the clustered kernel, SORTED:
    # long-tailed crossing counts make overflow rays common (terrain
    # random wavefront: 15% of rays exceed C=4), and 15% spread over the
    # wavefront leaves a live lane in nearly every 128-ray group — an
    # UNSORTED fallback sweep ran at almost full cost (the 586 ms mystery,
    # benchmarks/pairs_v2_profile.py). The dead-last sort packs overflow
    # rays into a few dense groups, making the fallback proportional to
    # the overflow fraction for one argsort+gather pass (~10 ms).
    t_fb, i_fb = mesh_search_pallas(
        mesh, origins, directions, t_min, interpret=interpret,
        alive=unsafe, t_cap=tcap, sort=True)
    t_res = jnp.where(unsafe, t_fb, t_res)
    i_res = jnp.where(unsafe, i_fb, i_res)
    return t_res, i_res
