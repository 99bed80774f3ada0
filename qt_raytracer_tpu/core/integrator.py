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
from .intersect import intersect_spheres
from .scene import SphereScene


class RayState(NamedTuple):
    origin: jnp.ndarray      # [N,3]
    direction: jnp.ndarray   # [N,3]
    throughput: jnp.ndarray  # [N,3]
    radiance: jnp.ndarray    # [N,3]
    alive: jnp.ndarray       # [N] bool


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
) -> jnp.ndarray:
    """Trace N rays to completion; returns linear radiance [N,3].

    sample_keys: [N] per-ray threefry keys; bounce b consumes stream
    STREAM_BOUNCE0+b (counter-based, shard-invariant).
    """
    # Derive the initial carry from the ray inputs (origins * 0) rather than
    # fresh constants: under shard_map, constants are "unvarying" over mesh
    # axes while the loop output varies, and lax.scan requires carry types to
    # match exactly (jax >= 0.9 varying-manual-axes check).
    zero3 = origins * 0.0
    state = RayState(
        origin=origins,
        direction=directions,
        throughput=zero3 + 1.0,
        radiance=zero3,
        alive=zero3[..., 0] == 0.0,
    )

    def bounce(state: RayState, depth_idx):
        hits = intersect_spheres(scene, state.origin, state.direction, t_min)

        uniforms = sampling.stream_uniforms(
            sample_keys, sampling.STREAM_BOUNCE0 + depth_idx,
            sampling.UNIFORMS_PER_BOUNCE,
        )
        sc = materials.scatter(
            scene, hits.prim_idx, state.direction, hits.normal,
            hits.front_face, uniforms,
        )

        miss = state.alive & ~hits.hit
        emit_hit = state.alive & hits.hit
        radiance = state.radiance
        radiance = radiance + jnp.where(
            miss[:, None], state.throughput * sky_color(state.direction), 0.0
        )
        radiance = radiance + jnp.where(
            emit_hit[:, None], state.throughput * sc.emitted, 0.0
        )

        continues = state.alive & hits.hit & sc.ok
        throughput = jnp.where(
            continues[:, None], state.throughput * sc.attenuation, state.throughput
        )
        origin = jnp.where(continues[:, None], hits.point, state.origin)
        direction = jnp.where(continues[:, None], sc.direction, state.direction)

        return RayState(origin, direction, throughput, radiance, continues), None

    state, _ = jax.lax.scan(bounce, state, jnp.arange(max_depth), unroll=1)
    return state.radiance
