"""Off-kernel gating analysis for the clustered mesh kernel.

For a batch of rays, computes per-128-ray-group cluster-visit counts under
three gates:
  popcount  — any lane's slab test passes (round-1 behavior)
  cap_final — any lane's box ENTRY <= that lane's FINAL t_best (the best any
              per-lane cap scheme can reach = perfect front-to-back order)
  cap_selfb — any lane's entry <= group-max final t (group-wide cap bound)

The gap popcount -> cap_final bounds the win available from per-lane
termination + ordering; measured on primary (coherent) and bounce-like
(incoherent) rays. Pure JAX on CPU (slow but exact).
"""

from __future__ import annotations

import argparse
import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=0)
    ap.add_argument("--n", type=int, default=131072)
    args = ap.parse_args()
    if args.rows:
        os.environ["QTRT_CLUSTER_ROWS"] = str(args.rows)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from qt_raytracer_tpu.accel.traverse import intersect_mesh
    from qt_raytracer_tpu.core.camera import get_rays
    from qt_raytracer_tpu.core.config import RenderConfig
    from qt_raytracer_tpu.core.render import pixel_grid
    from qt_raytracer_tpu.kernels.mesh_intersect import (
        CLUSTER_ROWS, prep_mesh_clusters, sort_keys)
    from qt_raytracer_tpu.models import meshes

    cfg = RenderConfig(width=1920, height=1080, spp=1, max_depth=5)
    world = meshes.terrain_world()
    cam = meshes.terrain_camera(cfg.aspect_ratio)
    mesh = world.mesh
    n = args.n

    _, box_planes, _, _, k, k_pad = prep_mesh_clusters(mesh)
    lo = jnp.stack([p.reshape(-1) for p in box_planes[0:3]], 1)[:k]  # [k,3]
    hi = jnp.stack([p.reshape(-1) for p in box_planes[3:6]], 1)[:k]

    i, j, _ = pixel_grid(cfg)
    base = cfg.width * (cfg.height // 2)
    i, j = i[base:base + n], j[base:base + n]
    o_p, d_p = get_rays(cam, (i + 0.5) / cfg.width, (j + 0.5) / cfg.height,
                        jnp.zeros((n,)), jnp.zeros((n,)))
    key = jax.random.PRNGKey(7)
    o_r = jax.random.uniform(key, (n, 3), minval=-4.0, maxval=4.0)
    o_r = o_r.at[:, 1].add(3.0)
    d_r = jax.random.normal(jax.random.fold_in(key, 1), (n, 3))
    d_r = d_r / jnp.linalg.norm(d_r, axis=1, keepdims=True)

    @jax.jit
    def analyze(o, d):
        th = intersect_mesh(mesh, o, d, 1e-3)
        t_best = th.t                                       # [N] BIG on miss
        inv = 1.0 / jnp.where(jnp.abs(d) < 1e-30,
                              jnp.where(d < 0, -1e-30, 1e-30), d)
        t0 = (lo[None] - o[:, None]) * inv[:, None]          # [N,k,3]
        t1 = (hi[None] - o[:, None]) * inv[:, None]
        enter = jnp.maximum(jnp.minimum(t0, t1).max(-1), 1e-3)
        exit_ = jnp.maximum(t0, t1).min(-1)
        m = exit_ > enter                                   # [N,k] box hit
        grp = lambda x: x.reshape(-1, 128, k)
        pop = grp(m).any(1).sum(-1)                         # [G]
        capf = grp(m & (enter <= t_best[:, None] * 1.0001 + 1e-4)
                   ).any(1).sum(-1)
        tg = t_best.reshape(-1, 128).max(-1)                # group max t
        tg_per_ray = jnp.repeat(tg, 128)[:, None]           # [N,1]
        caps = grp(m & (enter <= tg_per_ray)).any(1).sum(-1)
        per_ray = m.sum(-1)                                 # boxes per ray
        per_ray_cap = (m & (enter <= t_best[:, None] * 1.0001 + 1e-4)).sum(-1)

        # Sorted-wavefront simulation: reorder rays by candidate keys and
        # recount group unions. "prod" is the shipping octant+Morton key;
        # the c* keys sort by the ray's CROSSING SET itself (first/second
        # crossed cluster id) — the quantity the union actually depends on.
        octant = ((d[:, 0] < 0) * 4 + (d[:, 1] < 0) * 2
                  + (d[:, 2] < 0)).astype(jnp.int32)
        cell = jnp.clip(((o + 6.0) / 12.0 * 8).astype(jnp.int32), 0, 7)
        legacy = (octant << 9) | (cell[:, 0] << 6) | (cell[:, 1] << 3) \
            | cell[:, 2]
        prod = sort_keys(o, d, None, mesh.bvh_min[0], mesh.bvh_max[0])
        idx_k = jnp.arange(k, dtype=jnp.int32)[None, :]
        c1 = jnp.min(jnp.where(m, idx_k, k), axis=1)
        m2 = m & (idx_k > c1[:, None])
        c2 = jnp.min(jnp.where(m2, idx_k, k), axis=1)
        m3 = m2 & (idx_k > c2[:, None])
        c3 = jnp.min(jnp.where(m3, idx_k, k), axis=1)
        # cNsB: c1 quantized to superclusters of B (the cheap deployable
        # key: one [N, k/B] supercluster slab pass instead of [N, k]),
        # tie-broken by octant then the prod Morton key.
        keys = {
            "legacy": legacy,
            "prod": prod,
            "c1": c1,
            "c1_oct": (c1 << 3) | octant,
            "c1c2": c1 * (k + 1) + c2,
            "c1c2c3": (c1 * (k + 1) + c2) * (k + 1) + c3,
            "c1_prod": c1 * jnp.int32(1 << 18) + prod,
            "c1s4": (c1 // 4) * jnp.int32(1 << 18) + prod,
            "c1s8": (c1 // 8) * jnp.int32(1 << 18) + prod,
        }
        out = {}
        for kn, skey in keys.items():
            order = jnp.argsort(skey)
            ms, es, ts = m[order], enter[order], t_best[order]
            pop_s = grp(ms).any(1).sum(-1)
            capf_s = grp(ms & (es <= ts[:, None] * 1.0001 + 1e-4)
                         ).any(1).sum(-1)
            out[kn] = (pop_s.mean(), capf_s.mean())
        return (pop, capf, caps, out, per_ray, per_ray_cap,
                jnp.mean((t_best < 1e30).astype(jnp.float32)))

    for name, o, d in [("primary", o_p, d_p), ("random", o_r, d_r)]:
        pop, capf, caps, sorted_out, pr, prc, hr = analyze(o, d)
        print(f"{name}: k={k} hit_rate={float(hr):.3f}\n"
              f"  visits/group popcount={float(pop.mean()):.1f} "
              f"cap_final={float(capf.mean()):.1f} "
              f"cap_groupwide={float(caps.mean()):.1f}\n"
              f"  per-ray boxes={float(pr.mean()):.1f} "
              f"capped={float(prc.mean()):.1f}")
        for kn, (p, c) in sorted_out.items():
            print(f"  sorted[{kn:8s}]: popcount={float(p):.1f} "
                  f"cap_final={float(c):.1f}")


if __name__ == "__main__":
    main()
