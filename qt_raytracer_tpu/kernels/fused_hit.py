"""Pallas TPU kernel: fused closest-hit search + refinement + winner params.

The kernel-v1 pipeline (kernels/sphere_intersect.py) returns (t, idx) and
leaves refinement, normals and the winner-parameter gather to XLA. Profiling
the headline frame showed that split pays ~2x the kernel's own cost in data
movement per bounce:

  - the [N,16] parameter row-gather materializes a 128-lane-padded buffer
    (8x logical size) that every consumer fusion re-reads;
  - mixed layout demands ([N,3] {0,1:T(4,128)} scan carry vs the kernel's
    (rows,128) {1,0:T(8,128)} operands vs the gather's row-major outputs)
    make XLA relayout-copy several full ray arrays per bounce.

This kernel closes the loop: it keeps everything in VMEM and emits FLAT
per-ray outputs (hit point, shading normal, material parameters) that bitcast
straight into the flat-SoA integrator (core/integrator_flat.py). The winner's
13 parameters are extracted with one-hot masked sums over the candidate tile
(exact: the mask selects a single row, so no accumulation error), and the
well-conditioned refinement recompute (same recipe as core/intersect.py,
mirroring Sphere::hit, reference RayTracer.h:289-314) runs on (1,128) row
vectors inside the kernel where it is effectively free.

Differentiation: ALL outputs are detached. The flat path is forward-only by
design (render/bench); gradient-carrying renders use the v1 kernel + XLA
re-derives (core/intersect.py). Fast-forward and differentiable paths share
formulas, so forward values agree to ulp-level FMA-contraction differences.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.scene import SphereScene

BIG = 3.0e38
RAY_BLOCK = 128
SUBLANE = 8
TILE = SUBLANE * RAY_BLOCK  # 1024 rays per grid step

# Extraction-table column layout — MUST match core/intersect.py
# packed_param_table: cx cy cz r | ax ay az fuzz | ior mat ex ey | ez pad*3.
N_PARAMS = 13


def _fused_kernel(ox, oy, oz, dx, dy, dz, alive, excl, cx, cy, cz, c2r2,
                  ptab, t_out, idx_out, mat_out, ff_out,
                  px_out, py_out, pz_out, nx_out, ny_out, nz_out,
                  ax_out, ay_out, az_out, fz_out, io_out,
                  ex_out, ey_out, ez_out, rw_out,
                  tcand_ref, *, t_min: float, num_spheres: int,
                  shadow_only: bool, mxu_extract: bool):
    """One (S,128) sweep + refinement per ray row.

    shadow_only=True emits just (t, idx) — the NEE occlusion query needs
    nothing else, and skipping extraction/refinement halves its cost.

    excl (None or (8,128) i32 ref): per-lane excluded sphere id (-1 = none) —
    that candidate row is masked out of the sweep before the min-reduce (the
    silhouette boundary term's background re-trace, diff/edge.py). The
    compare+and is only compiled in when an exclusion operand exists, so the
    plain path's instruction stream is untouched.
    """
    c_x, c_y, c_z = cx[...], cy[...], cz[...]          # (S, 1)
    c2 = c2r2[...]
    s_rows = c_x.shape[0]

    def write_row(r, vals):
        outs = (t_out, idx_out) if shadow_only else (
            t_out, idx_out, mat_out, ff_out, px_out, py_out, pz_out,
            nx_out, ny_out, nz_out, ax_out, ay_out, az_out, fz_out, io_out,
            ex_out, ey_out, ez_out, rw_out)
        for ref, v in zip(outs, vals):
            ref[r:r+1, :] = v

    zero = jnp.zeros((1, RAY_BLOCK), jnp.float32)
    izero = jnp.zeros((1, RAY_BLOCK), jnp.int32)
    big = jnp.full((1, RAY_BLOCK), BIG, jnp.float32)

    def _extract_refine(r, a, t_best, idx_final, rows,
                        o_x, o_y, o_z, d_x, d_y, d_z):
        # --- winner-parameter extraction ---
        if mxu_extract:
            # One-hot matmul on the MXU: params are pre-split into three
            # bf16-EXACT pieces (8+8+8 mantissa bits = f32's 24), the
            # one-hot mask is exact in bf16, and MXU products accumulate
            # in f32 with a single nonzero term per lane — so
            # hi + mid + lo reconstructs the f32 parameter bit-exactly
            # (tests assert equality with the XLA gather). Replaces 13
            # VPU (S,B) multiply+reduce pairs with one (48,S)@(S,B) pass.
            maskb = jnp.where(rows == idx_final, 1.0, 0.0).astype(
                jnp.bfloat16)
            out = jax.lax.dot_general(
                ptab[...], maskb, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)      # (48, B)
            # Each output row is a single product (one-hot mask), so it
            # is an exact bf16 value even if Mosaic emits the matmul
            # with a bf16 result (observed on v5e: preferred_element_type
            # is not always honored). Upcast BEFORE summing the pieces or
            # the adds happen in bf16 and collapse to the hi piece.
            f32 = lambda x: x.astype(jnp.float32)
            p = [f32(out[k:k+1, :]) + f32(out[16+k:17+k, :])
                 + f32(out[32+k:33+k, :]) for k in range(N_PARAMS)]
        else:
            maskf = jnp.where(rows == idx_final, 1.0, 0.0)   # (S, B)
            p = [jnp.sum(maskf * ptab[:, k:k+1], axis=0, keepdims=True)
                 for k in range(N_PARAMS)]
        cw_x, cw_y, cw_z, r_w = p[0], p[1], p[2], p[3]
        al_x, al_y, al_z, fz_w = p[4], p[5], p[6], p[7]
        io_w, mat_w = p[8], p[9]
        em_x, em_y, em_z = p[10], p[11], p[12]

        # --- refinement: well-conditioned oc form, mirrors
        # core/intersect.py (Sphere::hit, RayTracer.h:289-305) ---
        hit = t_best < BIG
        oc_x, oc_y, oc_z = o_x - cw_x, o_y - cw_y, o_z - cw_z
        half_b1 = oc_x * d_x + oc_y * d_y + oc_z * d_z
        c1 = oc_x * oc_x + oc_y * oc_y + oc_z * oc_z - r_w * r_w
        disc1 = half_b1 * half_b1 - a * c1
        sq1 = jnp.where(disc1 > 0.0,
                        jnp.sqrt(jnp.where(disc1 > 0.0, disc1, 1.0)), 0.0)
        # Stable roots — MUST match core/intersect.py refinement exactly.
        sq_signed = jnp.where(half_b1 >= 0.0, sq1, -sq1)
        q1 = -half_b1 - sq_signed
        q1_safe = jnp.where(q1 == 0.0, 1.0, q1)
        root_a = q1 / a
        root_b = jnp.where(q1 == 0.0, 0.0, c1 / q1_safe)
        near1 = jnp.where(half_b1 >= 0.0, root_a, root_b)
        far1 = jnp.where(half_b1 >= 0.0, root_b, root_a)
        near_ok1 = (near1 >= t_min) & (near1 <= BIG)
        t_fine = jnp.where(near_ok1, near1, far1)
        fine_ok = (disc1 >= 0.0) & (
            near_ok1 | ((far1 >= t_min) & (far1 <= BIG)))
        t = jnp.where(hit & fine_ok, t_fine, t_best)

        # Geometry at the hit (miss lanes get benign finite values).
        t_safe = jnp.where(hit, t, 1.0)
        p_x = o_x + t_safe * d_x
        p_y = o_y + t_safe * d_y
        p_z = o_z + t_safe * d_z
        r_safe = jnp.where(r_w == 0.0, 1.0, r_w)
        ow_x = (p_x - cw_x) / r_safe
        ow_y = (p_y - cw_y) / r_safe
        ow_z = (p_z - cw_z) / r_safe
        ff = d_x * ow_x + d_y * ow_y + d_z * ow_z < 0.0
        sgn = jnp.where(ff, 1.0, -1.0)

        write_row(r, (t, idx_final, mat_w.astype(jnp.int32),
                      ff.astype(jnp.int32), p_x, p_y, p_z,
                      sgn * ow_x, sgn * ow_y, sgn * ow_z,
                      al_x, al_y, al_z, fz_w, io_w, em_x, em_y, em_z, r_w))

    for r in range(SUBLANE):
        row_alive = jnp.sum(alive[r:r+1, :]) > 0

        @pl.when(row_alive)
        def _(r=r):
            o_x, o_y, o_z = ox[r:r+1, :], oy[r:r+1, :], oz[r:r+1, :]
            d_x, d_y, d_z = dx[r:r+1, :], dy[r:r+1, :], dz[r:r+1, :]

            # --- closest-hit sweep (identical recipe to kernel v1) ---
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
            # Scratch round-trip: the min-reduce and the equality match must
            # read identical bits (FMA-contraction divergence otherwise).
            tcand_ref[...] = jnp.where(valid, root, BIG)
            tcand = tcand_ref[...]

            t_best = jnp.min(tcand, axis=0, keepdims=True)       # (1, B)
            rows = jax.lax.broadcasted_iota(jnp.int32, tcand.shape, 0)
            idx_best = jnp.min(
                jnp.where(tcand == t_best, rows, num_spheres), axis=0,
                keepdims=True)
            idx_final = jnp.where(idx_best >= num_spheres, 0, idx_best)

            if shadow_only:
                write_row(r, (t_best, idx_final))
                return

            # NOTE: an all-miss row gate (skip extraction+refinement when no
            # lane hits) was tried and measured SLOWER (kernel 163 -> 181 ms
            # per headline frame): the nested pl.when costs more in Mosaic
            # scheduling than the skipped work saves. Unconditional here.
            _extract_refine(r, a, t_best, idx_final, rows,
                            o_x, o_y, o_z, d_x, d_y, d_z)

        @pl.when(jnp.logical_not(row_alive))
        def _(r=r):
            if shadow_only:
                write_row(r, (big, izero))
            else:
                write_row(r, (big, izero, izero, izero,
                              zero, zero, zero, zero, zero, zero + 1.0,
                              zero, zero, zero, zero, zero + 1.0,
                              zero, zero, zero, zero))

def prep_fused_spheres(scene: SphereScene, mxu_extract: bool):
    """Kernel-layout sphere data: (S,1) sweep columns + the param table.

    Padding slots get +BIG cterm bias (never hit); the param table reuses
    core/intersect.py packed_param_table so extracted values are bit-identical
    to the XLA gather path.

    mxu_extract: table is (S,48) bf16 — each f32 parameter split into three
    bf16-exact pieces (hi, mid, lo at columns k, 16+k, 32+k) for the one-hot
    MXU extraction. Otherwise (S,16) f32 for the VPU masked-sum extraction.
    """
    from ..core.intersect import packed_param_table

    c = scene.center
    c2r2 = (jnp.sum(c * c, axis=-1) - scene.radius * scene.radius
            + jnp.where(scene.active, 0.0, BIG))
    s = c.shape[0]
    s_pad = max(-(-s // SUBLANE) * SUBLANE, SUBLANE)
    pad = lambda x, v: jnp.pad(x, (0, s_pad - s), constant_values=v)
    cols = (
        pad(c[:, 0], 1.0e9).reshape(s_pad, 1),
        pad(c[:, 1], 1.0e9).reshape(s_pad, 1),
        pad(c[:, 2], 1.0e9).reshape(s_pad, 1),
        pad(c2r2, BIG).reshape(s_pad, 1),
    )
    ptab = jnp.pad(packed_param_table(scene), ((0, s_pad - s), (0, 0)))
    if mxu_extract:
        # Split each f32 into three bf16-exact pieces by TRUNCATING the
        # mantissa with bit masks. Do NOT write this as
        # `x - bf16(x).astype(f32)`: XLA's algebraic simplifier elides the
        # f32->bf16->f32 round-trip when compiled on TPU, zeroing the mid/lo
        # pieces (observed on v5e; the eager/interpret path was correct,
        # which made the bug jit-only).
        def trunc(x):
            bits = jax.lax.bitcast_convert_type(x, jnp.uint32)
            return jax.lax.bitcast_convert_type(
                bits & jnp.uint32(0xFFFF0000), jnp.float32)

        hi = trunc(ptab)
        res = ptab - hi                     # exact (Sterbenz)
        mid = trunc(res)
        lo = res - mid                      # <= 8 significant bits: bf16-exact
        # (48, S) bf16, standard (M,K)@(K,N) orientation for the MXU.
        ptab = jnp.concatenate(
            [hi.astype(jnp.bfloat16), mid.astype(jnp.bfloat16),
             lo.astype(jnp.bfloat16)], axis=1).T
    return cols, ptab


@functools.partial(jax.jit, static_argnames=("t_min", "shadow_only",
                                              "interpret", "mxu_extract"))
def fused_hit_pallas(scene: SphereScene, ox, oy, oz, dx, dy, dz, alive,
                     t_min: float, shadow_only: bool = False,
                     interpret: bool = False, mxu_extract: bool = True,
                     exclude=None):
    """Fused hit query on flat ray components (all [N], N % 1024 == 0).

    Returns a dict of detached flat arrays:
      t, idx, mat, ff, px, py, pz, nx, ny, nz, ax, ay, az, fuzz, ior,
      ex, ey, ez                 (shadow_only=True: just t, idx)

    t = BIG means miss. Miss lanes carry sphere-0 parameters (matching the
    XLA path's params[0] gather) and benign finite geometry.

    exclude (optional [N] i32): per-lane sphere id masked out of the sweep
    (-1 = none) — the edge-aware background re-trace (diff/edge.py). Omitting
    it compiles the exclusion test out entirely.
    """
    args = [jax.lax.stop_gradient(x) for x in
            (ox, oy, oz, dx, dy, dz)]
    scene = jax.lax.stop_gradient(scene)
    n = ox.shape[0]
    if n % TILE:
        raise ValueError(f"fused path needs N % {TILE} == 0, got {n}")
    nb = n // TILE
    shp = (nb * SUBLANE, RAY_BLOCK)
    rs = lambda x: x.reshape(shp)
    alive_arr = rs(jax.lax.stop_gradient(alive).astype(jnp.int32))
    rays = [rs(x) for x in args] + [alive_arr]
    if exclude is not None:
        rays.append(rs(jax.lax.stop_gradient(exclude).astype(jnp.int32)))

    (cx, cy, cz, c2r2), ptab = prep_fused_spheres(scene, mxu_extract)
    s_pad = cx.shape[0]

    ray_spec = pl.BlockSpec((SUBLANE, RAY_BLOCK), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    col_spec = pl.BlockSpec((s_pad, 1), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    tab_spec = pl.BlockSpec(ptab.shape, lambda i: (0, 0),
                            memory_space=pltpu.VMEM)

    f_out = jax.ShapeDtypeStruct(shp, jnp.float32)
    i_out = jax.ShapeDtypeStruct(shp, jnp.int32)
    if shadow_only:
        names = ("t", "idx")
        out_shape = (f_out, i_out)
    else:
        names = ("t", "idx", "mat", "ff", "px", "py", "pz", "nx", "ny", "nz",
                 "ax", "ay", "az", "fuzz", "ior", "ex", "ey", "ez", "rw")
        out_shape = (f_out, i_out, i_out, i_out) + (f_out,) * 15

    n_ray_ops = len(rays)
    if exclude is None:
        def kernel(*refs):
            ins, outs_refs = refs[:n_ray_ops + 5], refs[n_ray_ops + 5:]
            _fused_kernel(*ins[:7], None, *ins[7:], *outs_refs[:-1],
                          *([None] * (19 - (2 if shadow_only else 19))),
                          outs_refs[-1], t_min=t_min,
                          num_spheres=scene.num_spheres,
                          shadow_only=shadow_only, mxu_extract=mxu_extract)
    else:
        def kernel(*refs):
            ins, outs_refs = refs[:n_ray_ops + 5], refs[n_ray_ops + 5:]
            _fused_kernel(*ins, *outs_refs[:-1],
                          *([None] * (19 - (2 if shadow_only else 19))),
                          outs_refs[-1], t_min=t_min,
                          num_spheres=scene.num_spheres,
                          shadow_only=shadow_only, mxu_extract=mxu_extract)

    outs = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[ray_spec] * n_ray_ops + [col_spec] * 4 + [tab_spec],
        out_specs=tuple(ray_spec for _ in out_shape),
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((s_pad, RAY_BLOCK), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=(25 if shadow_only else 60) * n * s_pad,
            bytes_accessed=n * 4 * (9 if shadow_only else 25),
            transcendentals=n * s_pad,
        ),
        interpret=interpret,
    )(*rays, cx, cy, cz, c2r2, ptab)

    flat = lambda x: jax.lax.stop_gradient(x.reshape(-1))
    return dict(zip(names, (flat(o) for o in outs)))
