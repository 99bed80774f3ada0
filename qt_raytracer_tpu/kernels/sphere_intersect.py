"""Pallas TPU kernel: fused, cluster-culled ray-sphere closest-hit search.

The XLA lowering of the [N,S] search (core/intersect.py) materializes
multi-hundred-MB intermediates in HBM and pads K=3 matmuls to K=128 on the
MXU. This kernel keeps the entire candidate computation in VMEM:

    layout:  rays    -> lanes   (128 rays per row, 8 rows per grid step)
             spheres -> sublanes ([S, 128] candidate tiles)

Spheres are Morton-ordered at scene build (core/scene.py spatial_sort), so
consecutive 64-sphere chunks are spatially tight CLUSTERS; each cluster gets
an AABB and a per-row slab gate: a 128-ray row only pays for the chunks its
rays' boxes actually cross (plus one near-global chunk containing any giant
ground sphere). Rows whose rays are all dead skip everything (wavefront
occupancy).

Per visited chunk the work is the exact Sphere::hit recipe
(RayTracer.h:289-305) as (64, 128) VPU tiles with a running min/argmin in
scratch. HBM traffic is just the SoA ray state in and (t, idx) out.

Differentiation: outputs are detached; the caller re-derives t from the
winning sphere via the well-conditioned refinement (core/intersect.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.scene import SphereScene

BIG = 3.0e38
RAY_BLOCK = 128   # rays per row (lane dimension)
SUBLANE = 8       # f32 sublane quantum
CHUNK_S = 64      # spheres per cluster chunk
# Cluster gating only pays when the scene is large: for S=512 (8 chunks) the
# gate overhead (box tests + scalar reduces + chunked scratch round-trips)
# measured SLOWER than one monolithic (S,128) sweep (7.3 vs 3.5 ms per 256Ki
# random rays; headline frame 0.77 s vs 0.59 s). Monolithic below this.
MIN_CHUNKS_FOR_CULLING = 16


def _search_kernel_monolithic(ox, oy, oz, dx, dy, dz, alive, excl, cx, cy,
                              cz, c2r2, t_out, idx_out, tcand_ref, tb_ref,
                              ib_ref, *, t_min: float, num_spheres: int):
    """One (S, 128) sweep per ray row — fastest for scenes up to ~1k spheres.

    excl (None or (8,128) i32 ref): per-lane excluded sphere id (-1 = none),
    masked out of the sweep before the min-reduce — the edge-aware
    background re-trace (diff/edge.py). Compiled in only when an exclusion
    operand exists (the plain instruction stream is untouched)."""
    c_x, c_y, c_z = cx[...], cy[...], cz[...]          # (S, 1)
    c2 = c2r2[...]
    s_rows = c_x.shape[0]

    for r in range(SUBLANE):
        row_alive = jnp.sum(alive[r:r+1, :]) > 0

        @pl.when(row_alive)
        def _(r=r):
            o_x, o_y, o_z = ox[r:r+1, :], oy[r:r+1, :], oz[r:r+1, :]
            d_x, d_y, d_z = dx[r:r+1, :], dy[r:r+1, :], dz[r:r+1, :]

            a = d_x * d_x + d_y * d_y + d_z * d_z
            o_dot_d = o_x * d_x + o_y * d_y + o_z * d_z
            o2 = o_x * o_x + o_y * o_y + o_z * o_z
            inv_a = 1.0 / a

            d_dot_c = c_x * d_x + c_y * d_y + c_z * d_z
            o_dot_c = c_x * o_x + c_y * o_y + c_z * o_z
            half_b = o_dot_d - d_dot_c
            cterm = o2 - 2.0 * o_dot_c + c2
            disc = half_b * half_b - a * cterm
            sq = jnp.sqrt(jnp.maximum(disc, 0.0))
            near = (-half_b - sq) * inv_a
            far = (-half_b + sq) * inv_a
            near_ok = (near >= t_min) & (near <= BIG)
            far_ok = (far >= t_min) & (far <= BIG)
            root = jnp.where(near_ok, near, far)
            valid = (disc >= 0.0) & (near_ok | far_ok)
            if excl is not None:
                srows = jax.lax.broadcasted_iota(
                    jnp.int32, (s_rows, RAY_BLOCK), 0)
                valid = valid & (srows != excl[r:r+1, :])
            # Scratch materialization: see clustered kernel comment.
            tcand_ref[...] = jnp.where(valid, root, BIG)
            tcand = tcand_ref[...]

            t_best = jnp.min(tcand, axis=0, keepdims=True)
            rows = jax.lax.broadcasted_iota(jnp.int32, tcand.shape, 0)
            idx_best = jnp.min(
                jnp.where(tcand == t_best, rows, num_spheres), axis=0,
                keepdims=True)
            t_out[r:r+1, :] = t_best
            idx_out[r:r+1, :] = jnp.where(idx_best >= num_spheres, 0,
                                          idx_best)

        @pl.when(jnp.logical_not(row_alive))
        def _(r=r):
            t_out[r:r+1, :] = jnp.full((1, RAY_BLOCK), BIG, jnp.float32)
            idx_out[r:r+1, :] = jnp.zeros((1, RAY_BLOCK), jnp.int32)


def _search_kernel(ox, oy, oz, dx, dy, dz, alive, cx, cy, cz, c2r2,
                   blo_x, blo_y, blo_z, bhi_x, bhi_y, bhi_z,
                   t_out, idx_out, tcand_ref, tb_ref, ib_ref,
                   *, t_min: float, num_spheres: int, num_chunks: int):
    for r in range(SUBLANE):
        row_alive = jnp.sum(alive[r:r+1, :]) > 0

        @pl.when(row_alive)
        def _(r=r):
            o_x, o_y, o_z = ox[r:r+1, :], oy[r:r+1, :], oz[r:r+1, :]  # (1, B)
            d_x, d_y, d_z = dx[r:r+1, :], dy[r:r+1, :], dz[r:r+1, :]
            live = alive[r:r+1, :] != 0

            # Per-ray invariants, (1, B).
            a = d_x * d_x + d_y * d_y + d_z * d_z
            o_dot_d = o_x * d_x + o_y * d_y + o_z * d_z
            o2 = o_x * o_x + o_y * o_y + o_z * o_z
            inv_a = 1.0 / a
            guard = lambda c: 1.0 / jnp.where(
                jnp.abs(c) < 1e-30, jnp.where(c < 0, -1e-30, 1e-30), c)
            ix, iy, iz = guard(d_x), guard(d_y), guard(d_z)

            tb_ref[...] = jnp.full((1, RAY_BLOCK), BIG, jnp.float32)
            ib_ref[...] = jnp.zeros((1, RAY_BLOCK), jnp.int32)

            for ck in range(num_chunks):
                # Cluster AABB gate (static scalar reads, (1, B) slab test).
                lx, ly, lz = blo_x[ck, 0], blo_y[ck, 0], blo_z[ck, 0]
                hx, hy, hz = bhi_x[ck, 0], bhi_y[ck, 0], bhi_z[ck, 0]
                t0x, t1x = (lx - o_x) * ix, (hx - o_x) * ix
                t0y, t1y = (ly - o_y) * iy, (hy - o_y) * iy
                t0z, t1z = (lz - o_z) * iz, (hz - o_z) * iz
                enter = jnp.maximum(
                    jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
                    jnp.maximum(jnp.minimum(t0z, t1z), t_min))
                exit_ = jnp.minimum(
                    jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
                    jnp.maximum(t0z, t1z))
                any_hit = jnp.sum(
                    ((exit_ > enter) & live).astype(jnp.int32)) > 0

                @pl.when(any_hit)
                def _(ck=ck):
                    s0 = ck * CHUNK_S
                    c_x = cx[s0:s0 + CHUNK_S, :]          # (C, 1)
                    c_y = cy[s0:s0 + CHUNK_S, :]
                    c_z = cz[s0:s0 + CHUNK_S, :]
                    c2 = c2r2[s0:s0 + CHUNK_S, :]

                    # (C, B) candidate tile — Sphere::hit.
                    d_dot_c = c_x * d_x + c_y * d_y + c_z * d_z
                    o_dot_c = c_x * o_x + c_y * o_y + c_z * o_z
                    half_b = o_dot_d - d_dot_c
                    cterm = o2 - 2.0 * o_dot_c + c2
                    disc = half_b * half_b - a * cterm
                    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
                    near = (-half_b - sq) * inv_a
                    far = (-half_b + sq) * inv_a
                    near_ok = (near >= t_min) & (near <= BIG)
                    far_ok = (far >= t_min) & (far <= BIG)
                    root = jnp.where(near_ok, near, far)
                    valid = (disc >= 0.0) & (near_ok | far_ok)
                    # Materialize candidates in scratch: min-reduce and the
                    # equality match MUST read identical bits (Mosaic may
                    # otherwise recompute with different FMA contraction —
                    # observed argmin corruption on v5e).
                    tcand_ref[...] = jnp.where(valid, root, BIG)
                    tcand = tcand_ref[...]

                    t_best = tb_ref[...]
                    tmin_c = jnp.min(tcand, axis=0, keepdims=True)   # (1, B)
                    rows = jax.lax.broadcasted_iota(jnp.int32, tcand.shape, 0)
                    # Lowest index among ties — matches jnp.argmin.
                    idx_c = jnp.min(
                        jnp.where(tcand == tmin_c, s0 + rows, num_spheres),
                        axis=0, keepdims=True)
                    better = tmin_c < t_best
                    tb_ref[...] = jnp.where(better, tmin_c, t_best)
                    ib_ref[...] = jnp.where(
                        better, jnp.where(idx_c >= num_spheres, 0, idx_c),
                        ib_ref[...])

            t_out[r:r+1, :] = tb_ref[...]
            idx_out[r:r+1, :] = ib_ref[...]

        @pl.when(jnp.logical_not(row_alive))
        def _(r=r):
            # Dead row: no search; outputs must still be written (miss).
            t_out[r:r+1, :] = jnp.full((1, RAY_BLOCK), BIG, jnp.float32)
            idx_out[r:r+1, :] = jnp.zeros((1, RAY_BLOCK), jnp.int32)


def prep_spheres(scene: SphereScene):
    """Pack sphere SoA into kernel layout [(S,1) columns] + cluster AABBs.

    Inactive/padding slots get a +BIG cterm bias (disc < 0, never hit) and
    empty cluster boxes (never gated in).
    """
    c = scene.center
    c2r2 = (jnp.sum(c * c, axis=-1) - scene.radius * scene.radius
            + jnp.where(scene.active, 0.0, BIG))
    s = c.shape[0]
    s_pad = max(-(-s // CHUNK_S) * CHUNK_S, CHUNK_S)
    pad = lambda x, v: jnp.pad(x, (0, s_pad - s), constant_values=v)
    cols = (
        pad(c[:, 0], 1.0e9).reshape(s_pad, 1),
        pad(c[:, 1], 1.0e9).reshape(s_pad, 1),
        pad(c[:, 2], 1.0e9).reshape(s_pad, 1),
        pad(c2r2, BIG).reshape(s_pad, 1),
    )

    # Cluster AABBs over center +- radius; inactive slots excluded.
    k = s_pad // CHUNK_S
    r_eff = jnp.where(scene.active, scene.radius, 0.0)
    lo = jnp.where(scene.active[:, None], c - r_eff[:, None], BIG)
    hi = jnp.where(scene.active[:, None], c + r_eff[:, None], -BIG)
    lo = jnp.pad(lo, ((0, s_pad - s), (0, 0)), constant_values=BIG)
    hi = jnp.pad(hi, ((0, s_pad - s), (0, 0)), constant_values=-BIG)
    clo = lo.reshape(k, CHUNK_S, 3).min(1)               # [k, 3]
    chi = hi.reshape(k, CHUNK_S, 3).max(1)
    k_pad = max(-(-k // SUBLANE) * SUBLANE, SUBLANE)
    boxes = tuple(
        jnp.pad(x[:, i], (0, k_pad - k),
                constant_values=(BIG if is_lo else -BIG)).reshape(k_pad, 1)
        for is_lo, x in ((True, clo), (False, chi)) for i in range(3)
    )
    return cols, boxes, k


@functools.partial(jax.jit, static_argnames=("t_min", "interpret"))
def sphere_search_pallas(scene: SphereScene, origins, directions,
                         t_min: float, interpret: bool = False, alive=None,
                         exclude=None):
    """Closest-hit search: returns (t [N] f32 with BIG=miss, idx [N] i32).

    alive: optional [N] bool — dead rays are guaranteed to return miss, and
    fully-dead 128-ray rows skip the search (wavefront occupancy win).

    exclude: optional [N] i32 per-lane excluded sphere id (-1 = none) —
    the edge-aware background re-trace. Supported on the monolithic sweep
    only (scenes under MIN_CHUNKS_FOR_CULLING*CHUNK_S spheres).

    Outputs are detached (stop_gradient) — differentiable quantities must be
    re-derived from idx by the caller.
    """
    # Fully detach the search: inputs carry no tangents (else JAX tries to
    # differentiate the pallas_call itself), outputs carry none either. The
    # caller re-derives every differentiable quantity from idx.
    origins = jax.lax.stop_gradient(origins)
    directions = jax.lax.stop_gradient(directions)
    scene = jax.lax.stop_gradient(scene)

    n = origins.shape[0]
    tile = SUBLANE * RAY_BLOCK  # 1024 rays per grid step
    n_pad = max(-(-n // tile) * tile, tile)
    nb = n_pad // tile

    def comp(x, i):
        return jnp.pad(x[:, i], (0, n_pad - n)).reshape(nb * SUBLANE,
                                                        RAY_BLOCK)

    rays = [comp(origins, i) for i in range(3)] + \
           [comp(directions, i) for i in range(3)]
    if alive is None:
        alive_arr = jnp.ones((nb * SUBLANE, RAY_BLOCK), jnp.int32)
    else:
        alive_arr = jnp.pad(
            jax.lax.stop_gradient(alive).astype(jnp.int32), (0, n_pad - n)
        ).reshape(nb * SUBLANE, RAY_BLOCK)
    rays.append(alive_arr)
    if exclude is not None:
        rays.append(jnp.pad(
            jax.lax.stop_gradient(exclude).astype(jnp.int32), (0, n_pad - n),
            constant_values=-1).reshape(nb * SUBLANE, RAY_BLOCK))
    (cx, cy, cz, c2r2), boxes, k = prep_spheres(scene)
    s_pad = cx.shape[0]
    k_pad = boxes[0].shape[0]

    ray_spec = pl.BlockSpec((SUBLANE, RAY_BLOCK), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    sphere_spec = pl.BlockSpec((s_pad, 1), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)
    box_spec = pl.BlockSpec((k_pad, 1), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)

    clustered = k >= MIN_CHUNKS_FOR_CULLING
    if clustered:
        if exclude is not None:
            raise ValueError("per-lane exclusion is not implemented for "
                             "the clustered (S >= 1024) sphere sweep")
        kernel = functools.partial(_search_kernel, t_min=t_min,
                                   num_spheres=scene.num_spheres,
                                   num_chunks=k)
        in_specs = [ray_spec] * 7 + [sphere_spec] * 4 + [box_spec] * 6
        inputs = (*rays, cx, cy, cz, c2r2, *boxes)
        cand_rows = CHUNK_S
    else:
        if exclude is None:
            def kernel(*refs):
                _search_kernel_monolithic(
                    *refs[:7], None, *refs[7:], t_min=t_min,
                    num_spheres=scene.num_spheres)
        else:
            kernel = functools.partial(
                _search_kernel_monolithic, t_min=t_min,
                num_spheres=scene.num_spheres)
        in_specs = [ray_spec] * len(rays) + [sphere_spec] * 4
        inputs = (*rays, cx, cy, cz, c2r2)
        cand_rows = s_pad

    t, idx = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=in_specs,
        out_specs=(ray_spec, ray_spec),
        out_shape=(
            jax.ShapeDtypeStruct((nb * SUBLANE, RAY_BLOCK), jnp.float32),
            jax.ShapeDtypeStruct((nb * SUBLANE, RAY_BLOCK), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((cand_rows, RAY_BLOCK), jnp.float32),
            pltpu.VMEM((1, RAY_BLOCK), jnp.float32),
            pltpu.VMEM((1, RAY_BLOCK), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=20 * n_pad * s_pad, bytes_accessed=n_pad * 4 * 8,
            transcendentals=n_pad * s_pad,
        ),
        interpret=interpret,
    )(*inputs)

    t = jax.lax.stop_gradient(t.reshape(-1)[:n])
    idx = jax.lax.stop_gradient(idx.reshape(-1)[:n])
    return t, idx
