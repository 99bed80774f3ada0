"""Per-stage profile of the round-4 pair pipeline (mesh_pairs.py v2).

Times each stage in isolation with scan-amortized dependent-input timing
(the same methodology as compactor_probe.py — block_until_ready through
the axon tunnel is not a fence). Run: python benchmarks/pairs_v2_profile.py
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

from qt_raytracer_tpu.kernels.mesh_intersect import (GROUPS, LANE,
                                                     mesh_search_pallas)
from qt_raytracer_tpu.kernels import mesh_pairs as mp
from qt_raytracer_tpu.models import meshes

BIG = 3.0e38
R = 8
N = 414720
C = 4


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


BASE = 0.0


def timed(name, step):
    t = scan_time(step) - BASE
    print(f"{name:40s} {t:8.2f} ms", flush=True)
    return t


def main():
    global BASE
    world = meshes.terrain_world()
    mesh = world.mesh
    k0 = jax.random.PRNGKey(7)
    o = jax.random.uniform(k0, (N, 3), minval=-4.0, maxval=4.0)
    o = o.at[:, 1].add(3.0)
    d = jax.random.normal(jax.random.fold_in(k0, 1), (N, 3))
    d = d / jnp.linalg.norm(d, axis=1, keepdims=True)
    oc = tuple(o[:, i] for i in range(3))
    dc = tuple(d[:, i] for i in range(3))
    k = mp.num_clusters(mesh.v0.shape[0])
    m_tot = N * C
    b_tot = -(-(m_tot + LANE * k) // (GROUPS * LANE)) * (GROUPS * LANE)
    ng = b_tot // LANE
    print(f"# k={k} N={N} C={C} m_tot={m_tot} b_tot={b_tot}", flush=True)

    BASE = scan_time(lambda i: jnp.float32(0.0) * i)
    print(f"# empty-step {BASE:.3f} ms", flush=True)
    probe = lambda x: jnp.sum(x.astype(jnp.float32) * 1e-9)

    # stage 1: crossing-list emission kernel
    def s1(i):
        ocp = (oc[0] + i.astype(jnp.float32) * 1e-9, oc[1], oc[2])
        clus_nc, ncross = mp.crossing_lists(mesh, ocp, dc, 1e-3, c_max=C)
        return probe(clus_nc) + probe(ncross)
    timed("crossing_lists kernel", s1)

    clus_nc, ncross = jax.jit(
        lambda: mp.crossing_lists(mesh, oc, dc, 1e-3, c_max=C))()
    clus_flat = clus_nc.reshape(-1)
    rid_flat = jnp.broadcast_to(
        jnp.arange(N, dtype=jnp.int32)[:, None], (N, C)).reshape(-1)

    # stage 2: the sort ((i >> 31) == 0 for the scan iota but is not
    # constant-foldable, so the op stays inside the scan)
    def s2b(i, cf=clus_flat, rf=rid_flat):
        ks, rs = lax.sort((cf ^ (i >> 31), rf + i), num_keys=1)
        return probe(ks) + probe(rs)
    timed("sort (cluster, rid)", s2b)

    clus_s, rid_s = jax.jit(lambda: lax.sort((clus_flat, rid_flat),
                                             num_keys=1))()

    # stage 3: bounds via k-query searchsorted
    def s3(i, cs=clus_s):
        qs = jnp.arange(k + 1, dtype=jnp.int32)
        b = jnp.searchsorted(cs, qs + (i >> 31), side="left")
        return probe(b)
    timed("searchsorted k+1 queries", s3)

    bounds = jax.jit(lambda: jnp.searchsorted(
        clus_s, jnp.arange(k + 1, dtype=jnp.int32),
        side="left").astype(jnp.int32))()
    cum = bounds[:-1]
    counts = bounds[1:] - cum
    padded = -(-counts // LANE) * LANE
    pstart = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(padded)[:-1]])

    # stage 4: marks + cummax
    def s4(i, ps=pstart):
        marks = jnp.zeros((b_tot,), jnp.int32).at[ps + (i >> 31)].max(
            jnp.arange(k, dtype=jnp.int32), mode="drop")
        return probe(lax.cummax(marks))
    timed("marks scatter + cummax [B]", s4)

    cmap = jax.jit(lambda: lax.cummax(
        jnp.zeros((b_tot,), jnp.int32).at[pstart].max(
            jnp.arange(k, dtype=jnp.int32), mode="drop")))()

    # stage 5: small-table gathers + src gather
    def s5(i, cm=cmap, rs=rid_s):
        off = jnp.arange(b_tot, dtype=jnp.int32) - pstart[cm] + (i >> 31)
        validj = off < counts[cm]
        src = jnp.clip(cum[cm] + off, 0, m_tot - 1)
        return probe(jnp.where(validj, rs[src], -1))
    timed("slot maps (3 tiny-table + 1 [M]) gathers", s5)

    ray_buf = jax.jit(lambda: jnp.where(
        (jnp.arange(b_tot, dtype=jnp.int32) - pstart[cmap])
        < counts[cmap],
        rid_s[jnp.clip(cum[cmap] + jnp.arange(b_tot, dtype=jnp.int32)
                       - pstart[cmap], 0, m_tot - 1)], -1))()

    # stage 6: ray-data table gather
    table = jnp.stack([*oc, *dc, jnp.full((N,), BIG, jnp.float32),
                       jnp.zeros((N,), jnp.float32)], axis=1)

    def s6(i, t=table, rb=ray_buf):
        return probe(t[jnp.clip(rb + (i >> 31), 0, N - 1)])
    timed("pair ray-data gather [B,8]", s6)

    # stage 7: full pipeline (the shipped function)
    def s7(i):
        ocp = (oc[0] + i.astype(jnp.float32) * 1e-9, oc[1], oc[2])
        t, idx = mp.mesh_search_pairs(mesh, ocp, dc, 1e-3)
        return probe(t) + probe(idx)
    timed("FULL mesh_search_pairs", s7)

    # reference: clustered
    def s8(i):
        ocp = (oc[0] + i.astype(jnp.float32) * 1e-9, oc[1], oc[2])
        t, idx = mesh_search_pallas(mesh, ocp, dc, 1e-3)
        return probe(t) + probe(idx)
    timed("REFERENCE mesh_search_pallas", s8)

    print(f"# ncross mean={float(jnp.mean(ncross)):.2f} "
          f"unsafe={float(jnp.mean((ncross > C)))*100:.2f}%", flush=True)


if __name__ == "__main__":
    main()
