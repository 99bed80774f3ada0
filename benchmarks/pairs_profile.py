"""Component profile of the pair-wavefront mesh path (mesh_pairs.py):
times each prologue/epilogue stage in isolation on the real chip to find
where the budget goes.  python benchmarks/pairs_profile.py"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp

from qt_raytracer_tpu.kernels.mesh_intersect import (GROUPS, LANE,
                                                     mesh_search_pallas)
from qt_raytracer_tpu.kernels import mesh_pairs as mp
from qt_raytracer_tpu.models import meshes

BIG = 3.0e38


def timed(name, fn, *args, iters=5):
    out = jax.block_until_ready(fn(*args))
    t0 = time.time()
    out = jax.block_until_ready(fn(*args))
    first = time.time() - t0
    ts = []
    for _ in range(iters):
        t0 = time.time()
        out = jax.block_until_ready(fn(*args))
        ts.append(time.time() - t0)
    print(f"{name}: best={min(ts)*1e3:.2f}ms", flush=True)
    return out


def main():
    world = meshes.terrain_world()
    mesh = world.mesh
    n = 414720
    k0 = jax.random.PRNGKey(7)
    o = jax.random.uniform(k0, (n, 3), minval=-4.0, maxval=4.0)
    o = o.at[:, 1].add(3.0)
    d = jax.random.normal(jax.random.fold_in(k0, 1), (n, 3))
    d = d / jnp.linalg.norm(d, axis=1, keepdims=True)

    lo, hi, k = mp.cluster_bounds(mesh)
    lo, hi = jax.block_until_ready((lo, hi))
    print(f"# k={k} clusters, n={n}", flush=True)
    t_min = 1e-3
    p_cap = 4 * n
    b_tot = -(-(p_cap + LANE * k) // (GROUPS * LANE)) * (GROUPS * LANE)
    ng = b_tot // LANE
    print(f"# p_cap={p_cap} b_tot={b_tot}", flush=True)

    @jax.jit
    def stage_mask(o, d):
        inv = 1.0 / jnp.where(jnp.abs(d) < 1e-30,
                              jnp.where(d < 0, -1e-30, 1e-30), d)
        enter = jnp.full((k, n), t_min, jnp.float32)
        exit_ = jnp.full((k, n), BIG, jnp.float32)
        for a in range(3):
            t0 = (lo[:, a:a+1] - o[None, :, a]) * inv[None, :, a]
            t1 = (hi[:, a:a+1] - o[None, :, a]) * inv[None, :, a]
            enter = jnp.maximum(enter, jnp.minimum(t0, t1))
            exit_ = jnp.minimum(exit_, jnp.maximum(t0, t1))
        return (exit_ > enter)

    mask = timed("mask [k,N]", stage_mask, o, d)
    print(f"# pairs={int(mask.sum())} avg/ray={float(mask.sum())/n:.2f}",
          flush=True)

    @jax.jit
    def stage_nonzero(mask):
        (pidx,) = jnp.nonzero(mask.reshape(-1), size=p_cap, fill_value=n * k)
        return pidx

    pidx = timed("nonzero", stage_nonzero, mask)

    @jax.jit
    def stage_cumsum(mask):
        return jnp.cumsum(mask.reshape(-1).astype(jnp.int32))

    timed("bare cumsum 81M", stage_cumsum, mask)

    @jax.jit
    def stage_manual_extract(mask):
        mi = mask.astype(jnp.int32)
        counts = jnp.sum(mi, axis=1)
        padded = -(-counts // LANE) * LANE
        pstart = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32), jnp.cumsum(padded)[:-1]])
        s = jnp.cumsum(mi.reshape(-1)).reshape(k, n)
        cum_rows = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts)[:-1]])
        within = s - cum_rows[:, None]
        slot = pstart[:, None] + within - 1
        vals = jnp.where(mask, jnp.arange(n, dtype=jnp.int32)[None, :], -1)
        buf = jnp.full((b_tot,), -1, jnp.int32).at[slot.reshape(-1)].max(
            vals.reshape(-1), mode="drop", indices_are_sorted=True)
        return buf

    ray_buf = timed("manual sorted scatter-max extract", stage_manual_extract,
                    mask)

    @jax.jit
    def stage_grouping(pidx):
        clus = pidx // n
        ray = pidx - clus * n
        valid = pidx < n * k
        cidx = jnp.clip(clus, 0, k - 1)
        counts = jnp.zeros((k,), jnp.int32).at[cidx].add(valid.astype(jnp.int32))
        cum = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts)[:-1]])
        padded = -(-counts // LANE) * LANE
        pstart = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32), jnp.cumsum(padded)[:-1]])
        rank = jnp.arange(p_cap, dtype=jnp.int32) - cum[cidx]
        slot = jnp.where(valid, pstart[cidx] + rank, b_tot)
        buf = jnp.full((b_tot,), -1, jnp.int32).at[slot].set(
            ray, mode="drop", unique_indices=True)
        return buf

    timed("grouping (counts+scatter from pidx)", stage_grouping, pidx)

    @jax.jit
    def stage_gather(ray_buf, o, d):
        table = jnp.concatenate(
            [o, d, jnp.zeros((n, 2), jnp.float32)], axis=1)
        return table[jnp.clip(ray_buf, 0, n - 1)]

    timed(f"packed gather [{b_tot}x8]", stage_gather, ray_buf, o, d)

    # full pairs path vs clustered, same rays
    f_pairs = jax.jit(functools.partial(
        mp.mesh_search_pairs, t_min=1e-3))
    timed("FULL mesh_search_pairs", lambda o, d: f_pairs(mesh, o, d), o, d)
    timed("FULL clustered (sorted)",
          lambda o, d: mesh_search_pallas(mesh, o, d, 1e-3), o, d)

    # fallback cost in the no-overflow case (all-dead, unsorted)
    dead = jnp.zeros((n,), bool)
    timed("clustered all-dead sort=False",
          lambda o, d: mesh_search_pallas(mesh, o, d, 1e-3, alive=dead,
                                          sort=False), o, d)


if __name__ == "__main__":
    main()
