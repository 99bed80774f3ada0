"""Sphere-search kernel speed-of-light accounting (round-4 VERDICT item 8).

The ledger claimed the search runs at ~27% of VPU SoL with "~4x kernel
headroom" based on a 20-ops/sphere estimate — while the roadmap says the
kernel is at its plateau. This probe closes the contradiction by (a)
counting the REAL per-(sphere, ray) op budget and (b) timing stripped
kernel variants that each remove one cost class (wrong results, timing
only), so the gap decomposes into measured components:

  full        the shipped instruction stream (scratch round-trip, argmin)
  noscratch   skip the tcand VMEM materialization (min/match read the
              recomputed value — numerically unsafe, timing only)
  tonly       no winner-index extraction (min-reduce only)
  nosqrt      discriminant test only (no sqrt, no roots): the irreducible
              dot-product core

Run on the real chip:  python benchmarks/sphere_sol_probe.py
"""

from __future__ import annotations

import functools
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG = 3.0e38
SUBLANE = 8
B = 128
R = 8
N = 259072 // 1024 * 1024          # ~259Ki rays (the ledger's floor config)
S = 512


def make_kernel(variant: str):
    def kernel(ox, oy, oz, dx, dy, dz, cx, cy, cz, c2r2,
               t_out, idx_out, tcand_ref, *, t_min: float):
        c_x, c_y, c_z = cx[...], cy[...], cz[...]          # (S, 1)
        c2 = c2r2[...]
        for r in range(SUBLANE):
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
            if variant == "nosqrt":
                tcand = jnp.where(disc >= 0.0, half_b, BIG)
            else:
                sq = jnp.sqrt(jnp.maximum(disc, 0.0))
                near = (-half_b - sq) * inv_a
                far = (-half_b + sq) * inv_a
                near_ok = (near >= t_min) & (near <= BIG)
                far_ok = (far >= t_min) & (far <= BIG)
                root = jnp.where(near_ok, near, far)
                valid = (disc >= 0.0) & (near_ok | far_ok)
                tcand = jnp.where(valid, root, BIG)
            if variant == "full":
                tcand_ref[...] = tcand
                tcand = tcand_ref[...]
            t_best = jnp.min(tcand, axis=0, keepdims=True)
            if variant in ("full", "noscratch"):
                rows = jax.lax.broadcasted_iota(jnp.int32, tcand.shape, 0)
                idx_best = jnp.min(
                    jnp.where(tcand == t_best, rows, S), axis=0,
                    keepdims=True)
                idx_out[r:r+1, :] = jnp.where(idx_best >= S, 0, idx_best)
            else:
                idx_out[r:r+1, :] = jnp.zeros((1, B), jnp.int32)
            t_out[r:r+1, :] = t_best
    return kernel


def run_variant(variant, rays, spheres):
    ox, oy, oz, dx, dy, dz = rays
    cx, cy, cz, c2 = spheres
    nb = N // (SUBLANE * B)
    ray_spec = pl.BlockSpec((SUBLANE, B), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    sph_spec = pl.BlockSpec((S, 1), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    f = pl.pallas_call(
        functools.partial(make_kernel(variant), t_min=1e-3),
        grid=(nb,),
        in_specs=[ray_spec] * 6 + [sph_spec] * 4,
        out_specs=(ray_spec, ray_spec),
        out_shape=(jax.ShapeDtypeStruct((nb * SUBLANE, B), jnp.float32),
                   jax.ShapeDtypeStruct((nb * SUBLANE, B), jnp.int32)),
        scratch_shapes=[pltpu.VMEM((S, B), jnp.float32)],
    )
    return f(ox, oy, oz, dx, dy, dz, cx, cy, cz, c2)


def scan_time(step, iters=3, warmup=1):
    @jax.jit
    def run():
        def body(acc, i):
            return acc + step(i), None
        acc, _ = lax.scan(body, jnp.float32(0.0), jnp.arange(R))
        return acc

    for _ in range(warmup):
        float(run())
    ts = []
    for _ in range(iters):
        t0 = time.time()
        float(run())
        ts.append(time.time() - t0)
    return min(ts) / R * 1e3


def main():
    key = jax.random.PRNGKey(0)
    rows = N // B
    o = jax.random.normal(key, (3, rows, B)) * 3.0
    d = jax.random.normal(jax.random.fold_in(key, 1), (3, rows, B))
    rays0 = tuple(o[i] for i in range(3)) + tuple(d[i] for i in range(3))
    c = jax.random.normal(jax.random.fold_in(key, 2), (3, S, 1)) * 4.0
    r = jax.random.uniform(jax.random.fold_in(key, 3), (S, 1)) * 0.5 + 0.1
    c2 = (c[0] ** 2 + c[1] ** 2 + c[2] ** 2) - r * r
    spheres = (c[0], c[1], c[2], c2)

    base = scan_time(lambda i: jnp.float32(0.0) * i)
    print(f"# device={jax.devices()[0].platform} N={N} S={S} R={R} "
          f"empty {base:.3f} ms", flush=True)
    for variant in ("full", "noscratch", "tonly", "nosqrt"):
        def step(i, v=variant):
            rays = (rays0[0] + i.astype(jnp.float32) * 1e-9,) + rays0[1:]
            t, idx = run_variant(v, rays, spheres)
            return jnp.sum(t * 1e-30) + jnp.sum(idx % 5).astype(jnp.float32)
        t = scan_time(step) - base
        ns_ray = t * 1e6 / N
        print(f"{variant:10s} {t:7.2f} ms  {ns_ray:6.2f} ns/ray", flush=True)


if __name__ == "__main__":
    main()
