"""Primitive-cost probe for pair-wavefront compaction designs (round 4).

The round-3 refutation (docs/PERFORMANCE.md) killed the pair path on two
XLA stages: jnp.nonzero at [k*N] scale (757 ms) and scatter-extract
(767 ms). Any revived design must route compaction through OTHER
primitives. This probe prices every candidate building block on the real
chip so the pipeline budget is arithmetic, not hope:

  sort     jax.lax.sort of M i32 keys (+1 payload) — cluster-major
           grouping of a ray-major pair list (replaces nonzero)
  top_k    per-ray crossing extraction over [N, K] with static shape C
  scatter/segment-min  per-ray reduction of M pair results into N rays
  searchsorted + gathers  padded-slot regrouping and pair-data fetch
  cumsum   per-group offset computation

Timing: scan-amortized (R iterations inside ONE jit with an iteration-
dependent input perturbation so XLA can neither hoist the op out of the
loop nor CSE it), synced by a dependent-scalar fetch — block_until_ready
through the axon tunnel is not a reliable fence (measured: it returns in
~0.02 ms for a 4M-element sort, i.e. it doesn't wait).

Run on the real chip:  python benchmarks/compactor_probe.py
"""

from __future__ import annotations

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
from jax import lax

N = 414720
K = 196
R = 8


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


BASE = None


def timed(name, step):
    t = scan_time(step) - BASE
    print(f"{name:44s} {t:8.2f} ms", flush=True)
    return t


def main() -> None:
    global BASE
    print(f"# device={jax.devices()[0].platform} N={N} K={K} R={R}",
          flush=True)
    key = jax.random.PRNGKey(0)
    BASE = scan_time(lambda i: jnp.float32(0.0) * i)
    print(f"# empty-step baseline {BASE:.3f} ms", flush=True)

    probe = lambda x: jnp.sum(x.astype(jnp.float32) * 1e-9)

    for m in (1 << 20, 1 << 21, 1 << 22):
        keys_r = jax.random.randint(key, (m,), 0, K, dtype=jnp.int32)
        pay = jnp.arange(m, dtype=jnp.int32)
        timed(f"sort    M={m:>8d} keys only",
              lambda i, k_=keys_r: probe(jax.lax.sort(k_ ^ i)))
        timed(f"sort    M={m:>8d} +1 payload",
              lambda i, k_=keys_r, p=pay: probe(
                  jax.lax.sort((k_ ^ i, p), num_keys=1)[1]))
        timed(f"argsort M={m:>8d}",
              lambda i, k_=keys_r: probe(jnp.argsort(k_ ^ i)))

    # per-ray crossing extraction: top_k over [N, K] (mask -> up to C ids)
    maskf = (jax.random.uniform(key, (N, K)) < (4.0 / K))
    for c in (4, 8):
        def topk(i, c=c, m_=maskf):
            score = jnp.where(
                m_ ^ (i % 2 == 2),  # always m_, but data-dependent on i
                K - jax.lax.broadcasted_iota(jnp.int32, m_.shape, 1), 0)
            vals, idxs = jax.lax.top_k(score, c)
            return probe(vals) + probe(idxs)
        timed(f"top_k   C={c} over [N,{K}]", topk)

    # per-ray reduction: M pair results -> N ray minima
    for m in (1 << 20, 1 << 21):
        rid_u = jax.random.randint(key, (m,), 0, N, dtype=jnp.int32)
        rid_s = jnp.sort(rid_u)
        tval = jax.random.uniform(key, (m,)) + 0.5
        timed(f"scatter-min M={m:>8d} unsorted ids",
              lambda i, r=rid_u, t=tval: probe(
                  jnp.full((N,), 3e38).at[r].min(t + i.astype(jnp.float32)
                                                 * 1e-9)))
        timed(f"scatter-min M={m:>8d} sorted ids",
              lambda i, r=rid_s, t=tval: probe(
                  jnp.full((N,), 3e38).at[r].min(
                      t + i.astype(jnp.float32) * 1e-9,
                      indices_are_sorted=True)))
        timed(f"segment-min M={m:>8d} (sorted)",
              lambda i, r=rid_s, t=tval: probe(jax.ops.segment_min(
                  t + i.astype(jnp.float32) * 1e-9, r, num_segments=N,
                  indices_are_sorted=True)))

    # regroup glue: padded-slot -> source mapping + the pair-data gather
    b = 1 << 21
    starts = jnp.sort(jax.random.randint(key, (K,), 0, b, dtype=jnp.int32))
    table = jax.random.uniform(key, (N, 8))
    ray_ids = jax.random.randint(key, (b,), 0, N, dtype=jnp.int32)
    timed(f"searchsorted K={K} over B={b}",
          lambda i, s=starts: probe(jnp.searchsorted(
              s, (jnp.arange(b, dtype=jnp.int32) + i) % b, side="right")))
    timed(f"gather  [B={b},8] rows",
          lambda i, t=table, r=ray_ids: probe(t[(r + i) % N]))
    timed(f"gather  [B={b},2] rows",
          lambda i, t=table, r=ray_ids: probe(t[:, :2][(r + i) % N]))
    perm = jax.random.permutation(key, b)
    tv = jax.random.uniform(key, (b,))
    timed(f"gather  [B={b}] flat by perm",
          lambda i, t=tv, p=perm: probe(t[(p + i) % b]))

    cnts = jax.random.randint(key, (3240 * K,), 0, 3, dtype=jnp.int32)
    timed("cumsum  [3240*K] i32",
          lambda i, c=cnts: probe(jnp.cumsum(c ^ i)))


if __name__ == "__main__":
    main()
