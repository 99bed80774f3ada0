"""Flat-SoA wavefront integrator (fast forward path).

Semantically IDENTICAL to core/integrator.py `trace` (same estimator, same
uniform slots, same tie-breaks — the float64 oracle applies to both), but the
ray state is carried as flat [N] component arrays instead of [N,3] vectors
and the closest hit comes from the fused Pallas kernel
(kernels/fused_hit.py) which also returns refined t, hit point, normal and
winner material parameters as flat arrays.

Why: profiling the headline frame showed ~half the per-bounce device time in
XLA layout conversions between the [N,3] scan carry and the kernel's
(rows,128) operands plus the 128-lane-padded [N,16] parameter gather. Flat
components bitcast straight into kernel tiles (N % 1024 == 0 after padding),
and winner parameters never leave VMEM un-extracted.

Coverage (round 3+): both scene families and both directions.
  - `trace_flat` handles sphere scenes; `trace_flat_world` handles mesh
    worlds (spheres + triangles + NEE) via the clustered mesh kernel.
  - `diff=True` re-derives every hit quantity differentiably from the
    detached kernel winners (Citardauq refinement / _tri_t_diff), so
    gradients DO flow — `diff/edge.py` rides this fast path (the
    `fused_diff` intersector). `diff=False` keeps the cheaper detached
    forward.

All math below mirrors its [N,3] counterpart line by line — keep the two in
sync (and the oracle, testing/oracle.py) when changing either.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

from . import sampling
from .intersect import packed_param_table
from .scene import DIELECTRIC, EMISSIVE, LAMBERTIAN, METAL, SphereScene
from ..kernels.fused_hit import BIG, TILE, fused_hit_pallas

TWO_PI = 6.283185307179586
INV_PI = 0.3183098861837907


def _safe_rsqrt_len2(x, y, z):
    """(n2, inv_len) mirroring vm.safe_unit_vector's guard semantics."""
    n2 = x * x + y * y + z * z
    ok = n2 > 1.0e-20
    inv = jnp.where(ok, 1.0 / jnp.sqrt(jnp.where(ok, n2, 1.0)), 0.0)
    return n2, inv


def _safe_sqrt(x):
    """Mirror vm.safe_sqrt (forward value = sqrt(max(x, 0)))."""
    xs = jnp.where(x > 0.0, x, 1.0)
    return jnp.where(x > 0.0, jnp.sqrt(xs), 0.0)


def _sky(dx, dy, dz):
    """sky_color (RayTracer.h:593-595) on flat components."""
    _, inv = _safe_rsqrt_len2(dx, dy, dz)
    t = 0.5 * (dy * inv + 1.0)
    return (1.0 - t) * 1.0 + t * 0.5, (1.0 - t) * 1.0 + t * 0.7, \
        (1.0 - t) * 1.0 + t * 1.0


def _scatter_flat(mat, ax, ay, az, fuzz, ior, ex, ey, ez,
                  dx, dy, dz, nx, ny, nz, ff, uni):
    """materials.scatter on flat components (identical formulas/slots)."""
    u0, u1, u2, u3 = uni[:, 0], uni[:, 1], uni[:, 2], uni[:, 3]
    _, inv = _safe_rsqrt_len2(dx, dy, dz)
    ux, uy, uz = dx * inv, dy * inv, dz * inv

    # Lambertian: normal + random_unit_vector, degenerate guard.
    zc = 1.0 - 2.0 * u0
    rr = jnp.sqrt(jnp.maximum(1.0e-20, 1.0 - zc * zc))
    phi = TWO_PI * u1
    rux, ruy, ruz = rr * jnp.cos(phi), rr * jnp.sin(phi), zc
    lx, ly, lz = nx + rux, ny + ruy, nz + ruz
    degen = lx * lx + ly * ly + lz * lz < 1.0e-8
    lx = jnp.where(degen, nx, lx)
    ly = jnp.where(degen, ny, ly)
    lz = jnp.where(degen, nz, lz)

    # Metal: mirror + fuzz * in_unit_sphere; absorb below horizon.
    din = ux * nx + uy * ny + uz * nz
    rfx = ux - 2.0 * din * nx
    rfy = uy - 2.0 * din * ny
    rfz = uz - 2.0 * din * nz
    cb = jnp.cbrt(u2)
    mx = rfx + fuzz * (rux * cb)
    my = rfy + fuzz * (ruy * cb)
    mz = rfz + fuzz * (ruz * cb)
    met_ok = mx * nx + my * ny + mz * nz > 0.0

    # Dielectric: Schlick vs uniform, TIR, white attenuation.
    ratio = jnp.where(ff, 1.0 / ior, ior)
    cos_t = jnp.minimum((-ux) * nx + (-uy) * ny + (-uz) * nz, 1.0)
    sin_t = _safe_sqrt(1.0 - cos_t * cos_t)
    cannot = ratio * sin_t > 1.0
    r0 = (1.0 - ratio) / (1.0 + ratio)
    r0 = r0 * r0
    refl = r0 + (1.0 - r0) * (1.0 - cos_t) ** 5
    must_reflect = cannot | (refl > u3)
    rpx = ratio * (ux + cos_t * nx)
    rpy = ratio * (uy + cos_t * ny)
    rpz = ratio * (uz + cos_t * nz)
    par = -_safe_sqrt(jnp.abs(1.0 - (rpx * rpx + rpy * rpy + rpz * rpz)))
    ddx = jnp.where(must_reflect, rfx, rpx + par * nx)
    ddy = jnp.where(must_reflect, rfy, rpy + par * ny)
    ddz = jnp.where(must_reflect, rfz, rpz + par * nz)

    is_lam = mat == LAMBERTIAN
    is_met = mat == METAL
    is_die = mat == DIELECTRIC
    is_emit = mat == EMISSIVE
    sdx = jnp.where(is_lam, lx, jnp.where(is_met, mx, ddx))
    sdy = jnp.where(is_lam, ly, jnp.where(is_met, my, ddy))
    sdz = jnp.where(is_lam, lz, jnp.where(is_met, mz, ddz))
    white = is_die | is_emit
    atx = jnp.where(white, 1.0, ax)
    aty = jnp.where(white, 1.0, ay)
    atz = jnp.where(white, 1.0, az)
    ok = jnp.where(is_met, met_ok, ~is_emit)
    emx = jnp.where(is_emit, ex, 0.0)
    emy = jnp.where(is_emit, ey, 0.0)
    emz = jnp.where(is_emit, ez, 0.0)
    return (sdx, sdy, sdz, atx, aty, atz, ok, emx, emy, emz, is_lam)


def _sphere_pdf_flat(lcx, lcy, lcz, lr, px, py, pz):
    """Solid-angle cone pdf on flat components; mirrors
    integrator._sphere_solid_angle_pdf exactly."""
    tox, toy, toz = lcx - px, lcy - py, lcz - pz
    dist2 = tox * tox + toy * toy + toz * toz
    outside = dist2 > lr * lr * 1.0001
    sin2 = jnp.clip(lr * lr / jnp.maximum(dist2, 1e-12), 0.0, 1.0)
    cos_max = _safe_sqrt(1.0 - sin2)
    omc = sin2 / (1.0 + cos_max)
    ok = outside & (omc > 1e-12)
    # NaN-safe denominator (integrator._sphere_solid_angle_pdf note).
    den = jnp.where(ok, jnp.maximum(TWO_PI * omc, 1e-30), 1.0)
    pdf = jnp.where(ok, 1.0 / den, 0.0)
    return pdf, ok, cos_max, (tox, toy, toz)


def _nee_flat(scene, px, py, pz, nx, ny, nz, ax, ay, az, tx, ty, tz,
              diffuse, uni, t_min, interpret):
    """_nee_mis on flat components (sphere lights; same estimator & slots)."""
    u4, u5, u6 = uni[:, 4], uni[:, 5], uni[:, 6]
    n_lights = scene.num_lights
    pick = jnp.clip((u4 * n_lights).astype(jnp.int32), 0, n_lights - 1)
    light = scene.light_idx[pick]
    lp = packed_param_table(scene)[light]
    lcx, lcy, lcz, lr = lp[:, 0], lp[:, 1], lp[:, 2], lp[:, 3]
    lex, ley, lez = lp[:, 10], lp[:, 11], lp[:, 12]

    pdf_j, ok, cos_max, (tox, toy, toz) = _sphere_pdf_flat(
        lcx, lcy, lcz, lr, px, py, pz)

    _, winv = _safe_rsqrt_len2(tox, toy, toz)
    wx, wy, wz = tox * winv, toy * winv, toz * winv
    cos_s = 1.0 - u5 * (1.0 - cos_max)
    sin_s = _safe_sqrt(1.0 - cos_s * cos_s)
    phi = TWO_PI * u6
    # Branchless ONB (Duff et al. 2017), mirrors integrator._onb.
    sign = jnp.where(wz >= 0.0, 1.0, -1.0)
    a = -1.0 / (sign + wz)
    b = wx * wy * a
    t1x, t1y, t1z = 1.0 + sign * wx * wx * a, sign * b, -sign * wx
    t2x, t2y, t2z = b, sign + wy * wy * a, -wy
    sc, ss = sin_s * jnp.cos(phi), sin_s * jnp.sin(phi)
    ldx = sc * t1x + ss * t2x + cos_s * wx
    ldy = sc * t1y + ss * t2y + cos_s * wy
    ldz = sc * t1z + ss * t2z + cos_s * wz

    cos_surf = nx * ldx + ny * ldy + nz * ldz
    cand = diffuse & ok & (cos_surf > 0.0)

    sh = fused_hit_pallas(scene, px, py, pz, ldx, ldy, ldz, cand,
                          float(t_min), shadow_only=True,
                          interpret=interpret)
    lit = cand & (sh["t"] < BIG) & (sh["idx"] == light)

    # One-sample MIS, balance heuristic: 1/pdf_nee and the weight combine
    # into a single denominator (mirrors integrator._nee_mis).
    pdf_nee = pdf_j / n_lights
    denom = pdf_nee + cos_surf * INV_PI
    den_f = jnp.where(cand, jnp.maximum(denom, 1e-30), 1.0)
    factor = jnp.where(cand, cos_surf * INV_PI / den_f, 0.0)
    cx = tx * ax * factor * lex
    cy = ty * ay * factor * ley
    cz = tz * az * factor * lez
    zero = jnp.zeros_like(cx)
    return (jnp.where(lit, cx, zero), jnp.where(lit, cy, zero),
            jnp.where(lit, cz, zero))


def _emit_weight_flat(h, ox, oy, oz, prev_pdf, n_lights):
    """Balance-heuristic weight for BSDF-sampled emitter hits (mirrors
    integrator._emitter_mis_weight, sphere lights only)."""
    ff = h["ff"] > 0
    sgn = jnp.where(ff, 1.0, -1.0)
    lcx = h["px"] - h["rw"] * sgn * h["nx"]
    lcy = h["py"] - h["rw"] * sgn * h["ny"]
    lcz = h["pz"] - h["rw"] * sgn * h["nz"]
    pdf_sph, _, _, _ = _sphere_pdf_flat(lcx, lcy, lcz, h["rw"], ox, oy, oz)
    pdf_nee = pdf_sph / n_lights
    use = prev_pdf > 0.0
    denom = jnp.where(use, prev_pdf + pdf_nee, 1.0)
    return jnp.where(use, prev_pdf / denom, 1.0)


def _world_hit_flat(world, ox, oy, oz, dx, dy, dz, alive, t_min, interpret,
                    mesh_kernel: str = "clustered", depth_idx=None):
    """Merged sphere+mesh closest hit on flat components (forward-only).

    Mirrors core/world.intersect_world's merge semantics (sphere hit from
    the fused kernel, mesh hit sphere-capped, strict '<' merge, unified
    prim id space) with every quantity detached. The mesh kernel consumes
    the flat components DIRECTLY (zero [N,3] materialization —
    kernels/mesh_intersect._comps).

    mesh_kernel: "clustered" (union-gated sweep), "pairs" (pair-wavefront
    path — wins on INCOHERENT wavefronts, round-4 measurements in
    docs/PERFORMANCE.md), or "hybrid" (clustered at depth_idx == 0,
    pairs for bounce wavefronts — a lax.cond on the traced depth, both
    searches are bitwise-identical for live lanes so the branch is
    semantics-free).
    """
    from ..kernels.mesh_intersect import mesh_search_pallas
    from ..kernels.mesh_pairs import mesh_search_pairs
    from .world import face_param_table

    spheres = world.spheres
    ns = spheres.num_spheres
    h = fused_hit_pallas(spheres, ox, oy, oz, dx, dy, dz, alive,
                         float(t_min), interpret=interpret)

    def _clustered(sort=True):
        return mesh_search_pallas(
            world.mesh, (ox, oy, oz), (dx, dy, dz), float(t_min),
            interpret=interpret, alive=alive, t_cap=h["t"], sort=sort)

    def _pairs():
        return mesh_search_pairs(
            world.mesh, (ox, oy, oz), (dx, dy, dz), float(t_min),
            interpret=interpret, alive=alive, t_cap=h["t"])

    # Primary-bounce sort skip: bounce-0 rays arrive in pixel scan order —
    # already coherent — so the crossing-sort pipeline (gate pass + argsort
    # + gathers + scatters) is pure overhead there. Measured (v5e, terrain
    # 1080p chunk, mesh_sort_cost.py): 168 ms sorted vs 100 ms unsorted at
    # bounce 0, while scattered bounce wavefronts NEED the sort (300 vs
    # 168 ms). Live-lane results are bitwise-identical either way (kernel
    # docstring), so the lax.cond on the traced depth is semantics-free.
    sort0 = os.environ.get("QTRT_MESH_SORT0", "1") != "0"
    if mesh_kernel == "pairs":
        t_m, idx_m = _pairs()
    elif mesh_kernel == "hybrid" and depth_idx is not None:
        t_m, idx_m = jax.lax.cond(depth_idx == 0, _clustered, _pairs)
    elif not sort0 and depth_idx is not None:
        t_m, idx_m = jax.lax.cond(depth_idx == 0,
                                  lambda: _clustered(sort=False),
                                  lambda: _clustered(sort=True))
    else:
        t_m, idx_m = _clustered()
    mesh_hit = t_m < BIG
    closer = mesh_hit & ((h["t"] >= BIG) | (t_m < h["t"]))

    t = jnp.where(closer, t_m, h["t"])
    t_safe = jnp.where(t < BIG, t, 1.0)
    fp = face_param_table(world.mesh)[idx_m]               # [N,16] gather
    gnx, gny, gnz = fp[:, 0], fp[:, 1], fp[:, 2]
    ff_m = dx * gnx + dy * gny + dz * gnz < 0.0
    sgn_m = jnp.where(ff_m, 1.0, -1.0)

    w = lambda m_val, s_val: jnp.where(closer, m_val, s_val)
    out = {
        "t": t,
        "prim": jnp.where(closer, ns + idx_m,
                          jnp.where(h["t"] < BIG, h["idx"], 0)),
        "mat": w(fp[:, 9].astype(jnp.int32), h["mat"]),
        "ff": w(ff_m.astype(jnp.int32), h["ff"]),
        "px": w(ox + t_safe * dx, h["px"]),
        "py": w(oy + t_safe * dy, h["py"]),
        "pz": w(oz + t_safe * dz, h["pz"]),
        "nx": w(sgn_m * gnx, h["nx"]),
        "ny": w(sgn_m * gny, h["ny"]),
        "nz": w(sgn_m * gnz, h["nz"]),
        "ax": w(fp[:, 4], h["ax"]), "ay": w(fp[:, 5], h["ay"]),
        "az": w(fp[:, 6], h["az"]),
        "fuzz": w(fp[:, 7], h["fuzz"]), "ior": w(fp[:, 8], h["ior"]),
        "ex": w(fp[:, 10], h["ex"]), "ey": w(fp[:, 11], h["ey"]),
        "ez": w(fp[:, 12], h["ez"]),
        "rw": w(jnp.zeros_like(t), h["rw"]),
        "area": jnp.where(closer, fp[:, 3], jnp.zeros_like(t)),
    }
    return out


def _tri_pdf_flat(wx, wy, wz, d2, nx, ny, nz, area):
    """Triangle-light area->solid-angle pdf on flat comps (mirrors
    integrator._nee_mis / _emitter_mis_weight's triangle side)."""
    cos_l = jnp.abs(nx * wx + ny * wy + nz * wz)
    ok = (d2 > 1e-12) & (cos_l > 1e-7) & (area > 1e-20)
    den = jnp.where(ok, jnp.maximum(cos_l * area, 1e-30), 1.0)
    pdf = jnp.where(ok, d2 / den, 0.0)
    return pdf, ok


def _nee_flat_world(world, lights, px, py, pz, nx, ny, nz, ax, ay, az,
                    tx, ty, tz, diffuse, uni, t_min, interpret):
    """integrator._nee_mis on flat components: one-sample MIS over the
    unified sphere+triangle light table, shadow = fused sphere kernel +
    sphere-capped mesh kernel (same merge as _world_hit_flat)."""
    from ..kernels.mesh_intersect import mesh_search_pallas

    u4, u5, u6 = uni[:, 4], uni[:, 5], uni[:, 6]
    n_lights = lights.n_total
    ns_l = lights.n_sphere
    pick = jnp.clip((u4 * n_lights).astype(jnp.int32), 0, n_lights - 1)
    row = lights.table[pick]                               # [N,16]
    exp_prim = lights.expected_prim[pick]
    is_tri = pick >= ns_l

    # Sphere light: cone sample (mirrors _nee_flat).
    lcx, lcy, lcz, lr = row[:, 0], row[:, 1], row[:, 2], row[:, 3]
    pdf_s, ok_s, cos_max, (tox, toy, toz) = _sphere_pdf_flat(
        lcx, lcy, lcz, lr, px, py, pz)
    _, winv = _safe_rsqrt_len2(tox, toy, toz)
    wxs, wys, wzs = tox * winv, toy * winv, toz * winv
    cos_s = 1.0 - u5 * (1.0 - cos_max)
    sin_s = _safe_sqrt(1.0 - cos_s * cos_s)
    phi = TWO_PI * u6
    sign = jnp.where(wzs >= 0.0, 1.0, -1.0)
    a_ = -1.0 / (sign + wzs)
    b_ = wxs * wys * a_
    t1x, t1y, t1z = 1.0 + sign * wxs * wxs * a_, sign * b_, -sign * wxs
    t2x, t2y, t2z = b_, sign + wys * wys * a_, -wys
    sc, ss = sin_s * jnp.cos(phi), sin_s * jnp.sin(phi)
    dsx = sc * t1x + ss * t2x + cos_s * wxs
    dsy = sc * t1y + ss * t2y + cos_s * wys
    dsz = sc * t1z + ss * t2z + cos_s * wzs

    # Triangle light: uniform-area sample (mirrors _nee_mis).
    v0x_, v0y_, v0z_ = row[:, 0], row[:, 1], row[:, 2]
    e1x_, e1y_, e1z_ = row[:, 3], row[:, 4], row[:, 5]
    e2x_, e2y_, e2z_ = row[:, 6], row[:, 7], row[:, 8]
    flip = u5 + u6 > 1.0
    bu = jnp.where(flip, 1.0 - u5, u5)
    bv = jnp.where(flip, 1.0 - u6, u6)
    plx = v0x_ + bu * e1x_ + bv * e2x_
    ply = v0y_ + bu * e1y_ + bv * e2y_
    plz = v0z_ + bu * e1z_ + bv * e2z_
    wvx, wvy, wvz = plx - px, ply - py, plz - pz
    d2 = wvx * wvx + wvy * wvy + wvz * wvz
    _, winv_t = _safe_rsqrt_len2(wvx, wvy, wvz)
    dtx, dty, dtz = wvx * winv_t, wvy * winv_t, wvz * winv_t
    crx = e1y_ * e2z_ - e1z_ * e2y_
    cry = e1z_ * e2x_ - e1x_ * e2z_
    crz = e1x_ * e2y_ - e1y_ * e2x_
    two_area = _safe_sqrt(crx * crx + cry * cry + crz * crz)
    area = 0.5 * two_area
    has_area = two_area > 1e-20
    inv2a = jnp.where(has_area,
                      1.0 / jnp.where(has_area, two_area, 1.0), 0.0)
    pdf_t, ok_t = _tri_pdf_flat(dtx, dty, dtz, d2, crx * inv2a, cry * inv2a,
                                crz * inv2a, area)

    ldx = jnp.where(is_tri, dtx, dsx)
    ldy = jnp.where(is_tri, dty, dsy)
    ldz = jnp.where(is_tri, dtz, dsz)
    pdf_j = jnp.where(is_tri, pdf_t, pdf_s)
    valid = jnp.where(is_tri, ok_t, ok_s)
    cos_surf = nx * ldx + ny * ldy + nz * ldz
    cand = diffuse & valid & (cos_surf > 0.0)

    # Shadow: closest world hit must be exactly the chosen light.
    sh = fused_hit_pallas(world.spheres, px, py, pz, ldx, ldy, ldz, cand,
                          float(t_min), shadow_only=True, interpret=interpret)
    t_m, idx_m = mesh_search_pallas(
        world.mesh, (px, py, pz), (ldx, ldy, ldz), float(t_min),
        interpret=interpret, alive=cand, t_cap=sh["t"])
    mesh_w = (t_m < BIG) & ((sh["t"] >= BIG) | (t_m < sh["t"]))
    has_win = mesh_w | (sh["t"] < BIG)
    win_prim = jnp.where(mesh_w, world.spheres.num_spheres + idx_m,
                         sh["idx"])
    lit = cand & has_win & (win_prim == exp_prim)

    lex, ley, lez = row[:, 9], row[:, 10], row[:, 11]
    pdf_nee = pdf_j / n_lights
    denom = pdf_nee + cos_surf * INV_PI
    den_f = jnp.where(cand, jnp.maximum(denom, 1e-30), 1.0)
    factor = jnp.where(cand, cos_surf * INV_PI / den_f, 0.0)
    cx = tx * ax * factor * lex
    cy = ty * ay * factor * ley
    cz = tz * az * factor * lez
    zero = jnp.zeros_like(cx)
    return (jnp.where(lit, cx, zero), jnp.where(lit, cy, zero),
            jnp.where(lit, cz, zero))


def _emit_weight_flat_world(h, ox, oy, oz, num_spheres, n_lights, prev_pdf):
    """integrator._emitter_mis_weight on flat components (both families)."""
    is_sphere = h["prim"] < num_spheres
    ff = h["ff"] > 0
    sgn = jnp.where(ff, 1.0, -1.0)
    lcx = h["px"] - h["rw"] * sgn * h["nx"]
    lcy = h["py"] - h["rw"] * sgn * h["ny"]
    lcz = h["pz"] - h["rw"] * sgn * h["nz"]
    pdf_sph, _, _, _ = _sphere_pdf_flat(lcx, lcy, lcz, h["rw"], ox, oy, oz)

    wvx, wvy, wvz = h["px"] - ox, h["py"] - oy, h["pz"] - oz
    d2 = wvx * wvx + wvy * wvy + wvz * wvz
    _, winv = _safe_rsqrt_len2(wvx, wvy, wvz)
    pdf_tri, _ = _tri_pdf_flat(wvx * winv, wvy * winv, wvz * winv, d2,
                               h["nx"], h["ny"], h["nz"], h["area"])
    pdf_nee = jnp.where(is_sphere, pdf_sph, pdf_tri) / n_lights
    use = prev_pdf > 0.0
    denom = jnp.where(use, prev_pdf + pdf_nee, 1.0)
    return jnp.where(use, prev_pdf / denom, 1.0)


def trace_flat(
    scene: SphereScene,
    origins: jnp.ndarray,
    directions: jnp.ndarray,
    sample_keys: jnp.ndarray,
    max_depth: int,
    t_min: float = 1.0e-3,
    nee: bool = False,
    rr_start: int = 0,
    interpret: bool = False,
    diff: bool = False,
    compact: bool = False,
    exclude_prim0=None,
) -> jnp.ndarray:
    """Drop-in replacement for integrator.trace (sphere scenes).

    Same signature contract: origins/directions [N,3], returns radiance
    [N,3]. Internally pads N up to a multiple of the 1024-ray kernel tile
    with dead rays (bit-transparent: dead rows are skipped and sliced off).

    diff=False (default): fastest forward path — the fused kernel computes
    every hit quantity in VMEM, all detached. Differentiating through it
    raises (custom_vjp guard) instead of silently returning zero gradients.

    diff=True: GRADIENT-capable fast path (VERDICT r1 item 6). The fused
    kernel runs in shadow_only mode for SELECTION only (winner idx + t,
    detached decisions — the estimator's contract); every quantity gradients
    flow through (refined t, hit point, normal, material params) is
    re-derived in XLA from the scene tensors on flat components. Keeps the
    flat-SoA carries (no [N,3]<->(rows,128) relayout tax) and costs ONE
    packed [N,16] param gather — the same gather the gradient path needs
    anyway to reach the scene parameters.
    """
    if not isinstance(scene, SphereScene):
        raise TypeError("trace_flat handles SphereScene only")
    if diff:
        return _trace_flat_impl(scene, origins, directions, sample_keys,
                                max_depth, float(t_min), bool(nee),
                                int(rr_start), bool(interpret), diff=True,
                                compact=bool(compact),
                                exclude_prim0=exclude_prim0)
    return _trace_flat_guarded(scene, origins, directions, sample_keys,
                               exclude_prim0,
                               max_depth, float(t_min), bool(nee),
                               int(rr_start), bool(interpret),
                               bool(compact))


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9, 10))
def _trace_flat_guarded(scene, origins, directions, sample_keys, exclude0,
                        max_depth, t_min, nee, rr_start, interpret, compact):
    return _trace_flat_impl(scene, origins, directions, sample_keys,
                            max_depth, t_min, nee, rr_start, interpret,
                            compact=compact, exclude_prim0=exclude0)


def _trace_flat_fwd(scene, origins, directions, sample_keys, exclude0,
                    max_depth, t_min, nee, rr_start, interpret, compact):
    out = _trace_flat_impl(scene, origins, directions, sample_keys,
                           max_depth, t_min, nee, rr_start, interpret,
                           compact=compact, exclude_prim0=exclude0)
    return out, None


def _trace_flat_bwd(max_depth, t_min, nee, rr_start, interpret, compact,
                    res, g):
    raise ValueError(
        "trace_flat (intersector='fused') is forward-only: the fused Pallas "
        "kernel detaches every hit quantity, so gradients would be silently "
        "zero. Use intersector='pallas' (TPU) or 'xla' for gradient renders "
        "(diff/inverse.make_train_step does this automatically).")


_trace_flat_guarded.defvjp(_trace_flat_fwd, _trace_flat_bwd)


def trace_flat_world(
    world,
    origins: jnp.ndarray,
    directions: jnp.ndarray,
    sample_keys: jnp.ndarray,
    max_depth: int,
    t_min: float = 1.0e-3,
    nee: bool = False,
    rr_start: int = 0,
    interpret: bool = False,
    compact: bool | None = None,
) -> jnp.ndarray:
    """Flat-SoA fast forward path for MESH WORLDS (spheres + triangles).

    compact: per-bounce alive-compaction sort of the carries (same bitwise
    contract as trace_flat's compact mode). None = read QTRT_MESH_COMPACT
    at trace time. Motivation (round-5 glue split): the clustered kernel's
    cost is occupancy-INSENSITIVE under scattered dead lanes (132 ms at
    6.4%% alive vs 137 at 100%% — dead lanes are spread across every
    (8,128) row so no row goes dead), while a sorted carry turns dead rows
    into contiguous skippable tiles.

    Same estimator/uniform slots as integrator.trace on a World — the f64
    oracle applies — with flat [N] carries and both Pallas kernels fed
    directly from flat components (no [N,3] materialization per bounce:
    the relayout tax the flat integrator exists to kill, roadmap 7).
    Forward-only: differentiating raises (mesh gradient renders use the
    [N,3] path with XLA re-derives)."""
    if compact is None:
        import os as _os
        compact = _os.environ.get("QTRT_MESH_COMPACT", "0") == "1"
    return _trace_flat_world_guarded(world, origins, directions, sample_keys,
                                     max_depth, float(t_min), bool(nee),
                                     int(rr_start), bool(interpret),
                                     bool(compact))


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9))
def _trace_flat_world_guarded(world, origins, directions, sample_keys,
                              max_depth, t_min, nee, rr_start, interpret,
                              compact=False):
    return _trace_flat_world_impl(world, origins, directions, sample_keys,
                                  max_depth, t_min, nee, rr_start, interpret,
                                  compact)


def _trace_flat_world_fwd(world, origins, directions, sample_keys,
                          max_depth, t_min, nee, rr_start, interpret,
                          compact=False):
    return _trace_flat_world_impl(world, origins, directions, sample_keys,
                                  max_depth, t_min, nee, rr_start,
                                  interpret, compact), None


def _trace_flat_world_bwd(max_depth, t_min, nee, rr_start, interpret,
                          compact, res, g):
    raise ValueError(
        "trace_flat_world is forward-only (both kernels detach every hit "
        "quantity). Use intersector='pallas' or 'xla' for gradient renders "
        "of mesh worlds (diff/inverse.make_train_step does this "
        "automatically).")


_trace_flat_world_guarded.defvjp(_trace_flat_world_fwd,
                                 _trace_flat_world_bwd)


def _trace_flat_world_impl(world, origins, directions, sample_keys,
                           max_depth, t_min, nee, rr_start, interpret,
                           compact=False):
    import os

    from .world import world_lights

    # Mesh-kernel policy for the bounce loop (QTRT_MESH_KERNEL):
    # "clustered" (default), "pairs" (all bounces), or "hybrid"
    # (clustered for the coherent depth-0 wavefront, pairs for bounce
    # wavefronts — where the pair path wins; round-4 measurements in
    # docs/PERFORMANCE.md).
    mesh_kernel = os.environ.get("QTRT_MESH_KERNEL", "clustered")
    if mesh_kernel not in ("clustered", "pairs", "hybrid"):
        mesh_kernel = "clustered"

    ns = world.spheres.num_spheres
    lights = world_lights(world)
    do_nee = bool(nee) and lights.n_total > 0

    n = origins.shape[0]
    n_pad = (-n) % TILE

    def padf(x, v=0.0):
        return jnp.pad(x, (0, n_pad), constant_values=v) if n_pad else x

    ox, oy, oz = (padf(origins[:, i]) for i in range(3))
    dx, dy, dz = padf(directions[:, 0]), padf(directions[:, 1]), \
        padf(directions[:, 2], 1.0)
    if sample_keys.ndim == 1:
        keys = padf(sample_keys)
    else:
        keys = jnp.pad(sample_keys, ((0, n_pad), (0, 0))) if n_pad \
            else sample_keys

    zero = ox * 0.0
    one = zero + 1.0
    alive0 = padf(origins[:, 0] * 0.0 + 1.0) > 0.5
    # Original lane id (input-derived; f32 iota exact to 2^24 lanes):
    # restores pixel order after the compact mode's per-bounce sorts.
    pid = (zero + jnp.arange(ox.shape[0], dtype=jnp.float32)).astype(
        jnp.int32)
    state = (ox, oy, oz, dx, dy, dz, one, one, one, zero, zero, zero,
             alive0, zero - 1.0, keys, pid)

    def bounce(state, depth_idx):
        (ox, oy, oz, dx, dy, dz, tx, ty, tz, rx, ry, rz,
         alive, prev_pdf, keys, pid) = state
        if compact:
            # Alive-compaction sort (same bitwise contract as the sphere
            # path's compact mode): live rays packed into a dense prefix
            # so whole kernel ray-rows go dead and the clustered sweep
            # skips them. Every per-ray quantity rides the permutation
            # (keys drive the RNG, pid restores order), so the image is
            # BITWISE unchanged. The sphere-path refutation (relayout tax
            # ~116 ms/bounce vs a cheap kernel) does NOT transfer: the
            # mesh bounce kernel is 130-170 ms and occupancy-insensitive
            # under scattered dead lanes (round-5 glue split).
            order = jnp.argsort(jnp.where(alive, 0, 1).astype(jnp.int32),
                                stable=True)
            g = lambda x: x[order]
            (ox, oy, oz, dx, dy, dz, tx, ty, tz, rx, ry, rz, prev_pdf,
             pid) = map(g, (ox, oy, oz, dx, dy, dz, tx, ty, tz, rx, ry,
                            rz, prev_pdf, pid))
            alive = g(alive)
            keys = g(keys)
        h = _world_hit_flat(world, ox, oy, oz, dx, dy, dz, alive, t_min,
                            interpret, mesh_kernel=mesh_kernel,
                            depth_idx=depth_idx)
        hit = h["t"] < BIG
        ff = h["ff"] > 0

        uni = sampling.stream_uniforms(
            keys, sampling.STREAM_BOUNCE0 + depth_idx,
            sampling.UNIFORMS_PER_BOUNCE)
        (sdx, sdy, sdz, atx, aty, atz, ok, emx, emy, emz,
         is_lam) = _scatter_flat(
            h["mat"], h["ax"], h["ay"], h["az"], h["fuzz"], h["ior"],
            h["ex"], h["ey"], h["ez"], dx, dy, dz,
            h["nx"], h["ny"], h["nz"], ff, uni)

        miss = alive & ~hit
        emit_hit = alive & hit
        if do_nee:
            emit_w = _emit_weight_flat_world(h, ox, oy, oz, ns,
                                             lights.n_total, prev_pdf)
        else:
            emit_w = 1.0
        skx, sky_, skz = _sky(dx, dy, dz)
        zero_ = rx * 0.0
        rx = rx + jnp.where(miss, tx * skx, zero_)
        ry = ry + jnp.where(miss, ty * sky_, zero_)
        rz = rz + jnp.where(miss, tz * skz, zero_)
        rx = rx + jnp.where(emit_hit, tx * emx * emit_w, zero_)
        ry = ry + jnp.where(emit_hit, ty * emy * emit_w, zero_)
        rz = rz + jnp.where(emit_hit, tz * emz * emit_w, zero_)

        diffuse = alive & hit & is_lam
        if do_nee:
            nx_, ny_, nz_ = _nee_flat_world(
                world, lights, h["px"], h["py"], h["pz"],
                h["nx"], h["ny"], h["nz"], h["ax"], h["ay"], h["az"],
                tx, ty, tz, diffuse, uni, t_min, interpret)
            rx, ry, rz = rx + nx_, ry + ny_, rz + nz_

        continues = alive & hit & ok
        tx = jnp.where(continues, tx * atx, tx)
        ty = jnp.where(continues, ty * aty, ty)
        tz = jnp.where(continues, tz * atz, tz)
        if rr_start > 0:
            p_cont = jnp.clip(jnp.maximum(jnp.maximum(tx, ty), tz),
                              0.05, 1.0)
            do_rr = continues & (depth_idx >= rr_start)
            survive = uni[:, 7] < p_cont
            adj = do_rr & survive
            tx = jnp.where(adj, tx / p_cont, tx)
            ty = jnp.where(adj, ty / p_cont, ty)
            tz = jnp.where(adj, tz / p_cont, tz)
            continues = continues & (~do_rr | survive)
        ox = jnp.where(continues, h["px"], ox)
        oy = jnp.where(continues, h["py"], oy)
        oz = jnp.where(continues, h["pz"], oz)
        dx = jnp.where(continues, sdx, dx)
        dy = jnp.where(continues, sdy, dy)
        dz = jnp.where(continues, sdz, dz)
        if do_nee:
            _, sinv = _safe_rsqrt_len2(sdx, sdy, sdz)
            cos_next = (h["nx"] * sdx + h["ny"] * sdy + h["nz"] * sdz) * sinv
            pdf_next = jnp.where(diffuse & continues,
                                 jnp.maximum(cos_next, 0.0) * INV_PI, -1.0)
            prev_pdf = jnp.where(continues, pdf_next, prev_pdf)
        return (ox, oy, oz, dx, dy, dz, tx, ty, tz, rx, ry, rz,
                continues, prev_pdf, keys, pid), None

    state, _ = jax.lax.scan(bounce, state, jnp.arange(max_depth), unroll=1)
    rx, ry, rz, pid = state[9], state[10], state[11], state[15]
    rad = jnp.stack([rx, ry, rz], axis=-1)
    if compact:
        rad = jnp.zeros_like(rad).at[pid].set(rad, unique_indices=True,
                                              mode="drop")
    return rad[:n]


def _rederive_hits_flat(scene, ox, oy, oz, dx, dy, dz, t_sel, idx, t_min):
    """Differentiable winner re-derivation on flat components.

    Mirrors intersect.intersect_spheres' refinement EXACTLY (Citardauq
    roots, same guards — core/intersect.py:160-190): selection (idx, hit)
    is detached, values are differentiable functions of the scene tensors.
    Returns the same dict contract as fused_hit_pallas(shadow_only=False).
    """
    params = packed_param_table(scene)[idx]                # [N,16] diff
    cxs, cys, czs = params[:, 0], params[:, 1], params[:, 2]
    r = params[:, 3]

    ocx, ocy, ocz = ox - cxs, oy - cys, oz - czs
    a1 = dx * dx + dy * dy + dz * dz
    half_b = ocx * dx + ocy * dy + ocz * dz
    c1 = ocx * ocx + ocy * ocy + ocz * ocz - r * r
    disc = half_b * half_b - a1 * c1
    sqrtd = _safe_sqrt(disc)
    sq_signed = jnp.where(half_b >= 0.0, sqrtd, -sqrtd)
    q1 = -half_b - sq_signed
    q1_safe = jnp.where(q1 == 0.0, 1.0, q1)
    root_a = q1 / a1
    root_b = jnp.where(q1 == 0.0, 0.0, c1 / q1_safe)
    near = jnp.where(half_b >= 0.0, root_a, root_b)
    far = jnp.where(half_b >= 0.0, root_b, root_a)
    near_ok = near >= t_min
    t_fine = jnp.where(near_ok, near, far)
    fine_ok = (disc >= 0.0) & (near_ok | (far >= t_min))

    hit = t_sel < BIG                                      # detached decision
    t = jnp.where(hit & fine_ok, t_fine, jax.lax.stop_gradient(t_sel))
    t_safe = jnp.where(hit, t, 1.0)
    px = ox + t_safe * dx
    py = oy + t_safe * dy
    pz = oz + t_safe * dz
    r_safe = jnp.where(r == 0.0, 1.0, r)
    owx = (px - cxs) / r_safe
    owy = (py - cys) / r_safe
    owz = (pz - czs) / r_safe
    ff = dx * owx + dy * owy + dz * owz < 0.0
    sgn = jnp.where(ff, 1.0, -1.0)
    return {
        "t": t, "idx": idx, "mat": params[:, 9].astype(jnp.int32),
        "ff": ff.astype(jnp.int32),
        "px": px, "py": py, "pz": pz,
        "nx": sgn * owx, "ny": sgn * owy, "nz": sgn * owz,
        "ax": params[:, 4], "ay": params[:, 5], "az": params[:, 6],
        "fuzz": params[:, 7], "ior": params[:, 8],
        "ex": params[:, 10], "ey": params[:, 11], "ez": params[:, 12],
        "rw": r,
    }


def _trace_flat_impl(scene, origins, directions, sample_keys,
                     max_depth, t_min, nee, rr_start, interpret,
                     diff=False, compact=False, exclude_prim0=None):
    n = origins.shape[0]
    n_pad = (-n) % TILE

    def padf(x, v=0.0):
        return jnp.pad(x, (0, n_pad), constant_values=v) if n_pad else x

    ox, oy, oz = (padf(origins[:, i]) for i in range(3))
    dx, dy, dz = padf(directions[:, 0]), padf(directions[:, 1]), \
        padf(directions[:, 2], 1.0)
    if sample_keys.ndim == 1:
        keys = padf(sample_keys)
    else:
        keys = jnp.pad(sample_keys, ((0, n_pad), (0, 0))) if n_pad \
            else sample_keys

    zero = ox * 0.0
    one = zero + 1.0
    # Derive the initial alive mask from the ray INPUTS (not a fresh
    # constant): under shard_map a constant is "unvarying" over mesh axes
    # while the scan output varies, and lax.scan requires carry types to
    # match exactly (same workaround as integrator.trace's zero3 carries).
    # Padding lanes (constant 0 directions) come out dead, as required.
    alive0 = padf(origins[:, 0] * 0.0 + 1.0) > 0.5
    do_nee = bool(nee) and scene.num_lights > 0
    n_tot = ox.shape[0]
    # Original lane id, derived from an INPUT (shard_map varying-carry rule);
    # f32 iota is exact to 2^24 lanes. Restores pixel order after compaction.
    pid = (padf(origins[:, 0]) * 0.0
           + jnp.arange(n_tot, dtype=jnp.float32)).astype(jnp.int32)
    excl0 = None
    if exclude_prim0 is not None:
        if compact:
            raise ValueError("exclude_prim0 is incompatible with compact "
                             "(lane permutation would detach the exclusion)")
        excl0 = jnp.pad(exclude_prim0.astype(jnp.int32), (0, n_pad),
                        constant_values=-1) if n_pad else             exclude_prim0.astype(jnp.int32)
    state = (ox, oy, oz, dx, dy, dz, one, one, one, zero, zero, zero,
             alive0, zero - 1.0,  # ..., alive, prev_pdf (-1 = full weight)
             keys, pid)

    def bounce(state, depth_idx):
        (ox, oy, oz, dx, dy, dz, tx, ty, tz, rx, ry, rz,
         alive, prev_pdf, keys, pid) = state
        # Silhouette background re-trace: winner excluded at bounce 0 ONLY
        # (diff/edge.py); later bounces see the full scene.
        excl_b = None if excl0 is None else jnp.where(
            depth_idx == 0, excl0, -1)
        if compact:
            # Alive-compaction sort: pack live rays into a dense prefix so
            # whole 128-lane kernel rows go dead (the kernel's row_alive
            # gate skips them). Stable argsort keeps live rays in lane
            # order; every per-ray quantity rides along (keys drive the
            # RNG, pid restores pixel order at the end), so per-ray values
            # — and the final image — are BITWISE unchanged (tested).
            # MEASURED REFUTATION (v5e, headline 1080p d10): default OFF.
            # In-scan permutation forces a relayout of every flat carry
            # between the linear gather layout and the kernel's (rows,128)
            # tiles — ~116 ms per bounce-chunk at 414Ki rays (bench 11.08
            # -> 0.35 Msamples/s), dwarfing the ~4.5x kernel-row saving
            # (alive decays 0.83 -> 0.02; unsorted dead-ROW fraction only
            # reaches 0.36). An isolated argsort+gathers microbench reads
            # ~0.1 ms — the cost is the LAYOUT chain, not the sort. The
            # mesh kernel keeps its boundary sort (measured 1.7x win: its
            # kernel is 30x costlier than the sort's relayouts).
            order = jnp.argsort(jnp.where(alive, 0, 1).astype(jnp.int32),
                                stable=True)
            g = lambda x: x[order]
            (ox, oy, oz, dx, dy, dz, tx, ty, tz, rx, ry, rz, prev_pdf,
             pid) = map(g, (ox, oy, oz, dx, dy, dz, tx, ty, tz, rx, ry,
                            rz, prev_pdf, pid))
            alive = g(alive)
            keys = g(keys)
        if diff:
            sel = fused_hit_pallas(scene, ox, oy, oz, dx, dy, dz, alive,
                                   float(t_min), shadow_only=True,
                                   interpret=interpret, exclude=excl_b)
            h = _rederive_hits_flat(scene, ox, oy, oz, dx, dy, dz,
                                    sel["t"], sel["idx"], t_min)
        else:
            h = fused_hit_pallas(scene, ox, oy, oz, dx, dy, dz, alive,
                                 float(t_min), interpret=interpret,
                                 exclude=excl_b)
        hit = h["t"] < BIG
        ff = h["ff"] > 0

        uni = sampling.stream_uniforms(
            keys, sampling.STREAM_BOUNCE0 + depth_idx,
            sampling.UNIFORMS_PER_BOUNCE)
        (sdx, sdy, sdz, atx, aty, atz, ok, emx, emy, emz,
         is_lam) = _scatter_flat(
            h["mat"], h["ax"], h["ay"], h["az"], h["fuzz"], h["ior"],
            h["ex"], h["ey"], h["ez"], dx, dy, dz,
            h["nx"], h["ny"], h["nz"], ff, uni)

        miss = alive & ~hit
        emit_hit = alive & hit
        if do_nee:
            emit_w = _emit_weight_flat(h, ox, oy, oz, prev_pdf,
                                       scene.num_lights)
        else:
            emit_w = 1.0
        skx, sky_, skz = _sky(dx, dy, dz)
        zero_ = rx * 0.0
        rx = rx + jnp.where(miss, tx * skx, zero_)
        ry = ry + jnp.where(miss, ty * sky_, zero_)
        rz = rz + jnp.where(miss, tz * skz, zero_)
        rx = rx + jnp.where(emit_hit, tx * emx * emit_w, zero_)
        ry = ry + jnp.where(emit_hit, ty * emy * emit_w, zero_)
        rz = rz + jnp.where(emit_hit, tz * emz * emit_w, zero_)

        diffuse = alive & hit & is_lam
        if do_nee:
            nx_, ny_, nz_ = _nee_flat(
                scene, h["px"], h["py"], h["pz"], h["nx"], h["ny"], h["nz"],
                h["ax"], h["ay"], h["az"], tx, ty, tz, diffuse, uni,
                t_min, interpret)
            rx, ry, rz = rx + nx_, ry + ny_, rz + nz_

        continues = alive & hit & ok
        tx = jnp.where(continues, tx * atx, tx)
        ty = jnp.where(continues, ty * aty, ty)
        tz = jnp.where(continues, tz * atz, tz)
        if rr_start > 0:
            p_cont = jnp.clip(jnp.maximum(jnp.maximum(tx, ty), tz),
                              0.05, 1.0)
            do_rr = continues & (depth_idx >= rr_start)
            survive = uni[:, 7] < p_cont
            adj = do_rr & survive
            tx = jnp.where(adj, tx / p_cont, tx)
            ty = jnp.where(adj, ty / p_cont, ty)
            tz = jnp.where(adj, tz / p_cont, tz)
            continues = continues & (~do_rr | survive)
        ox = jnp.where(continues, h["px"], ox)
        oy = jnp.where(continues, h["py"], oy)
        oz = jnp.where(continues, h["pz"], oz)
        dx = jnp.where(continues, sdx, dx)
        dy = jnp.where(continues, sdy, dy)
        dz = jnp.where(continues, sdz, dz)
        if do_nee:
            # pdf of the bounce that produced the continuing ray (mirrors
            # integrator.trace): cosine/pi for diffuse, -1 for specular.
            _, sinv = _safe_rsqrt_len2(sdx, sdy, sdz)
            cos_next = (h["nx"] * sdx + h["ny"] * sdy + h["nz"] * sdz) * sinv
            pdf_next = jnp.where(diffuse & continues,
                                 jnp.maximum(cos_next, 0.0) * INV_PI, -1.0)
            prev_pdf = jnp.where(continues, pdf_next, prev_pdf)
        return (ox, oy, oz, dx, dy, dz, tx, ty, tz, rx, ry, rz,
                continues, prev_pdf, keys, pid), None

    state, _ = jax.lax.scan(bounce, state, jnp.arange(max_depth), unroll=1)
    rx, ry, rz, pid = state[9], state[10], state[11], state[15]
    rad = jnp.stack([rx, ry, rz], axis=-1)
    if compact:
        # Undo the composed per-bounce permutations: lane i holds ray
        # pid[i]'s radiance.
        rad = jnp.zeros_like(rad).at[pid].set(rad, unique_indices=True,
                                              mode="drop")
    return rad[:n]
