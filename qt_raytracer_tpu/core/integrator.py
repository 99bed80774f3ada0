"""Wavefront path-tracing integrator.

The reference integrator is a *recursive* per-ray function
(``ray_color``, RayTracer.h:579-596) on the CPU and an iterative
throughput/radiance loop in each GPU kernel (GpuPathTracer.cpp:204-258).
Recursion and data-dependent loop exits do not exist under XLA, so the TPU
integrator is the wavefront transformation: a ``lax.scan`` over bounce depth on
SoA ray state with an alive mask. Dead lanes ride along masked (no compaction;
occupancy-driven compaction is a later optimization — SURVEY.md §5
"long-context" note).

Semantics map (bounce b, alive ray):
    miss           -> radiance += throughput * sky(d);        die
    hit, scatter   -> throughput *= attenuation;              continue
    hit, absorbed  -> die (black, RayTracer.h:590)
    hit, emissive  -> radiance += throughput * emission;      die (NEE ext.)
    depth exhausted-> contributes 0 (depth<=0 -> black, RayTracer.h:582)
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import materials, sampling, vecmath as vm
from .intersect import intersect_spheres, packed_param_table
from .world import World, as_world, intersect_world
from .scene import LAMBERTIAN, SphereScene


class RayState(NamedTuple):
    origin: jnp.ndarray      # [N,3]
    direction: jnp.ndarray   # [N,3]
    throughput: jnp.ndarray  # [N,3]
    radiance: jnp.ndarray    # [N,3]
    alive: jnp.ndarray       # [N] bool
    emit_ok: jnp.ndarray     # [N] bool: emitter hit counts (False right after
    #                          a diffuse bounce when NEE already sampled it)


def _onb(w):
    """Branchless orthonormal basis around unit vector w (Duff et al. 2017)."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    sign = jnp.where(wz >= 0.0, 1.0, -1.0)
    a = -1.0 / (sign + wz)
    b = wx * wy * a
    t1 = jnp.stack([1.0 + sign * wx * wx * a, sign * b, -sign * wx], axis=-1)
    t2 = jnp.stack([b, sign + wy * wy * a, -wy], axis=-1)
    return t1, t2


def _nee_contribution(world: World, hits, normal, throughput,
                      diffuse_mask, uniforms, t_min, intersector):
    """Next-event estimation: direct light via solid-angle (cone) sampling of
    a uniformly chosen emissive sphere, one shadow-ray wavefront.

    No reference analog (BASELINE config 2 extension). Estimator: for light
    with center c, radius r seen from p under half-angle cos_max,
    pdf_dir = 1/(2*pi*(1-cos_max)); the reference-consistent diffuse BRDF is
    albedo/pi (core/materials.py samples cosine-weighted with attenuation =
    albedo), so

        L += T * albedo/pi * cos_surf * Le * 2*pi*(1-cos_max) * n_lights
    """
    scene = world.spheres
    u4, u5, u6 = uniforms[:, 4], uniforms[:, 5], uniforms[:, 6]
    n_lights = scene.max_lights

    pick = jnp.clip((u4 * n_lights).astype(jnp.int32), 0, n_lights - 1)
    light = scene.light_idx[pick]                        # [N] (-1 = no light)
    has_light = light >= 0
    light_safe = jnp.maximum(light, 0)
    # One packed row-gather for all light params (same economics as Hits).
    lp = packed_param_table(scene)[light_safe]
    lc, lr, le = lp[:, 0:3], lp[:, 3], lp[:, 10:13]

    p = hits.point
    to_l = lc - p
    dist2 = vm.length_squared(to_l)
    outside = dist2 > lr * lr * 1.0001
    sin2_max = jnp.clip(lr * lr / jnp.maximum(dist2, 1e-12), 0.0, 1.0)
    cos_max = vm.safe_sqrt(1.0 - sin2_max)

    w = vm.safe_unit_vector(to_l)
    cos_s = 1.0 - u5 * (1.0 - cos_max)
    sin_s = vm.safe_sqrt(1.0 - cos_s * cos_s)
    phi = 2.0 * jnp.pi * u6
    t1, t2 = _onb(w)
    ldir = (sin_s * jnp.cos(phi))[:, None] * t1 \
        + (sin_s * jnp.sin(phi))[:, None] * t2 + cos_s[:, None] * w

    cos_surf = vm.dot(normal, ldir)
    cand = diffuse_mask & has_light & outside & (cos_surf > 0.0)

    shadow = intersect_world(world, p, ldir, t_min, backend=intersector,
                             alive=cand)
    lit = cand & shadow.hit & (shadow.prim_idx == light_safe)

    weight = 2.0 * (1.0 - cos_max) * n_lights            # 2pi/pdf_norm / pi
    contrib = throughput * hits.albedo * (cos_surf * weight)[:, None] * le
    return jnp.where(lit[:, None], contrib, 0.0)


def sky_color(directions):
    """Vertical white->blue gradient on miss (RayTracer.h:593-595)."""
    unit = vm.safe_unit_vector(directions)
    t = 0.5 * (unit[..., 1] + 1.0)
    white = jnp.array([1.0, 1.0, 1.0], directions.dtype)
    blue = jnp.array([0.5, 0.7, 1.0], directions.dtype)
    return (1.0 - t)[..., None] * white + t[..., None] * blue


def trace(
    scene: SphereScene,
    origins: jnp.ndarray,
    directions: jnp.ndarray,
    sample_keys: jnp.ndarray,
    max_depth: int,
    t_min: float = 1.0e-3,
    intersector: str = "xla",
    nee: bool = False,
    rr_start: int = 0,
) -> jnp.ndarray:
    """Trace N rays to completion; returns linear radiance [N,3].

    sample_keys: [N] per-ray threefry keys; bounce b consumes stream
    STREAM_BOUNCE0+b (counter-based, shard-invariant).

    nee: enable next-event estimation (direct light sampling on diffuse hits
    plus emitter-hit suppression after diffuse bounces; unbiased, massively
    lower variance in enclosed emissive scenes like the Cornell box).

    rr_start: Russian-roulette termination from this bounce index on
    (0 = off, reference semantics). Survival probability = clamp(max
    throughput channel, 0.05, 1.0) with exact throughput compensation —
    unbiased; kills deep low-energy paths so whole 128-ray rows go dead and
    the kernels skip them. Uses uniform slot 7 (oracle-mirrored).

    scene may be a SphereScene or a World (spheres + triangle mesh).
    """
    world = as_world(scene)
    # Derive the initial carry from the ray inputs (origins * 0) rather than
    # fresh constants: under shard_map, constants are "unvarying" over mesh
    # axes while the loop output varies, and lax.scan requires carry types to
    # match exactly (jax >= 0.9 varying-manual-axes check).
    zero3 = origins * 0.0
    true_mask = zero3[..., 0] == 0.0
    state = RayState(
        origin=origins,
        direction=directions,
        throughput=zero3 + 1.0,
        radiance=zero3,
        alive=true_mask,
        emit_ok=true_mask,
    )

    def bounce(state: RayState, depth_idx):
        hits = intersect_world(world, state.origin, state.direction,
                               t_min, backend=intersector,
                               alive=state.alive)

        uniforms = sampling.stream_uniforms(
            sample_keys, sampling.STREAM_BOUNCE0 + depth_idx,
            sampling.UNIFORMS_PER_BOUNCE,
        )
        sc = materials.scatter(
            hits.mat_type, hits.albedo, hits.fuzz, hits.ior, hits.emission,
            state.direction, hits.normal, hits.front_face, uniforms,
        )

        miss = state.alive & ~hits.hit
        # NEE suppression applies only to sphere lights (the light table);
        # emissive MESH hits are never NEE-sampled, so they must always count
        # or their energy would be lost.
        is_mesh_hit = hits.prim_idx >= world.spheres.num_spheres
        emit_hit = state.alive & hits.hit & (state.emit_ok | is_mesh_hit)
        radiance = state.radiance
        radiance = radiance + jnp.where(
            miss[:, None], state.throughput * sky_color(state.direction), 0.0
        )
        radiance = radiance + jnp.where(
            emit_hit[:, None], state.throughput * sc.emitted, 0.0
        )

        diffuse_hit = state.alive & hits.hit & (hits.mat_type == LAMBERTIAN)
        if nee:
            radiance = radiance + _nee_contribution(
                world, hits, hits.normal, state.throughput, diffuse_hit,
                uniforms, t_min, intersector)

        continues = state.alive & hits.hit & sc.ok
        throughput = jnp.where(
            continues[:, None], state.throughput * sc.attenuation, state.throughput
        )
        if rr_start > 0:
            p_cont = jnp.clip(jnp.max(throughput, axis=-1), 0.05, 1.0)
            do_rr = continues & (depth_idx >= rr_start)
            survive = uniforms[:, 7] < p_cont
            throughput = jnp.where((do_rr & survive)[:, None],
                                   throughput / p_cont[:, None], throughput)
            continues = continues & (~do_rr | survive)
        origin = jnp.where(continues[:, None], hits.point, state.origin)
        direction = jnp.where(continues[:, None], sc.direction, state.direction)
        # After a diffuse bounce with NEE, the next emitter hit is already
        # accounted for by the shadow ray — suppress it (no double counting).
        emit_ok = ~diffuse_hit if nee else true_mask

        return RayState(origin, direction, throughput, radiance, continues,
                        emit_ok), None

    state, _ = jax.lax.scan(bounce, state, jnp.arange(max_depth), unroll=1)
    return state.radiance
