"""Per-bounce kernel-at-occupancy vs dense-glue split (round-5 VERDICT #3).

The round-4 frame decomposition (docs/PERFORMANCE.md) showed every terrain
bounce costs a flat ~105-145 ms regardless of sky die-off and named the
composition "the sorted search at whatever occupancy PLUS dense glue at
full N" — without splitting the two. This script does the split on the
REAL config-4 wavefront:

  1. reconstructs the exact bounce-k ray populations (o, d, alive) of a
     1080p frame chunk by stepping the SAME helpers the flat integrator's
     scan body uses (_world_hit_flat + _scatter_flat + the continues rule;
     terrain config has nee=False, rr off, so the wavefront evolution
     needs nothing else);
  2. times the bare mesh search (_world_hit_flat) on each bounce's actual
     population/alive mask — "kernel at occupancy";
  3. times trace_flat_world at depths 1..D on the same chunk — successive
     differences give the per-bounce TOTAL cost;
  4. reports glue_k = bounce_total_k - kernel_k and the live fraction.

If glue >= ~30% at bounces 2+, bounce-level carry compaction (sort alive
to the front between per-bounce device calls) is worth prototyping at the
mesh bounce's 30-50x cost scale; else the ledger gets a same-standard
refutation entry.

Run on the real chip:  python benchmarks/mesh_glue_split.py [--chunk 3]
"""

from __future__ import annotations

import argparse
import functools
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunk", type=int, default=3,
                    help="1080p frame chunk (0-4); 3 is terrain-heavy")
    ap.add_argument("--n", type=int, default=414720)
    ap.add_argument("--depth", type=int, default=5)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--interpret", action="store_true",
                    help="CPU smoke: run the Pallas kernels in interpret "
                         "mode (tiny --n advised)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from qt_raytracer_tpu.core import sampling
    from qt_raytracer_tpu.core.camera import get_rays
    from qt_raytracer_tpu.core.config import RenderConfig
    from qt_raytracer_tpu.core.integrator_flat import (_scatter_flat,
                                                       _world_hit_flat, BIG,
                                                       trace_flat_world)
    from qt_raytracer_tpu.core.render import pixel_grid
    from qt_raytracer_tpu.models import meshes

    interp = args.interpret
    world = meshes.terrain_world()
    n = args.n
    cfg = RenderConfig(width=1920, height=1080, spp=1, max_depth=args.depth)
    cam = meshes.terrain_camera(cfg.aspect_ratio)
    i, j, _ = pixel_grid(cfg)
    base = args.chunk * n
    i, j = i[base:base + n], j[base:base + n]
    o, d = get_rays(cam, (i + 0.5) / cfg.width, (j + 0.5) / cfg.height,
                    jnp.zeros((n,)), jnp.zeros((n,)))
    k = jax.random.PRNGKey(7)
    keys = sampling.pixel_states(k, jnp.arange(n, dtype=jnp.uint32), "hash")
    skeys = sampling.sample_keys(keys, 0)

    # --- 1. exact bounce-k wavefronts (one jitted step per bounce) -------
    @functools.partial(jax.jit, static_argnames=("depth_idx",))
    def step(ox, oy, oz, dx, dy, dz, alive, skeys, depth_idx):
        h = _world_hit_flat(world, ox, oy, oz, dx, dy, dz, alive, cfg.t_min,
                            interp, mesh_kernel="clustered",
                            depth_idx=depth_idx)
        hit = h["t"] < BIG
        ff = h["ff"] > 0
        uni = sampling.stream_uniforms(
            skeys, sampling.STREAM_BOUNCE0 + depth_idx,
            sampling.UNIFORMS_PER_BOUNCE)
        (sdx, sdy, sdz, _, _, _, ok, _, _, _, _) = _scatter_flat(
            h["mat"], h["ax"], h["ay"], h["az"], h["fuzz"], h["ior"],
            h["ex"], h["ey"], h["ez"], dx, dy, dz,
            h["nx"], h["ny"], h["nz"], ff, uni)
        cont = alive & hit & ok
        ox = jnp.where(cont, h["px"], ox)
        oy = jnp.where(cont, h["py"], oy)
        oz = jnp.where(cont, h["pz"], oz)
        dx = jnp.where(cont, sdx, dx)
        dy = jnp.where(cont, sdy, dy)
        dz = jnp.where(cont, sdz, dz)
        return ox, oy, oz, dx, dy, dz, cont

    ox, oy, oz = o[:, 0], o[:, 1], o[:, 2]
    dx, dy, dz = d[:, 0], d[:, 1], d[:, 2]
    alive = jnp.ones((n,), bool)
    waves = [(ox, oy, oz, dx, dy, dz, alive)]
    for depth_idx in range(args.depth - 1):
        ox, oy, oz, dx, dy, dz, alive = step(ox, oy, oz, dx, dy, dz,
                                             alive, skeys, depth_idx)
        jax.block_until_ready(alive)
        waves.append((ox, oy, oz, dx, dy, dz, alive))

    # --- 2. bare kernel at each bounce's occupancy -----------------------
    @jax.jit
    def kern(ox, oy, oz, dx, dy, dz, alive):
        h = _world_hit_flat(world, ox, oy, oz, dx, dy, dz, alive, cfg.t_min,
                            interp, mesh_kernel="clustered", depth_idx=1)
        return jnp.sum(jnp.where(h["t"] < BIG, h["t"], 0.0))

    @jax.jit
    def sort_by_alive(ox, oy, oz, dx, dy, dz, alive):
        # Stable partition: alive lanes to the front (the compaction a
        # sorted carry would give the kernel — contiguous dead ray-tiles).
        perm = jnp.argsort(~alive, stable=True)
        return tuple(a[perm] for a in (ox, oy, oz, dx, dy, dz)) + (
            alive[perm],)

    kernel_ms, kernel_sorted_ms, alive_frac = [], [], []
    for w in waves:
        float(kern(*w))            # compile + warm
        ts = []
        for _ in range(args.iters):
            t0 = time.time()
            float(kern(*w))        # dependent-scalar fetch = tunnel fence
            ts.append(time.time() - t0)
        kernel_ms.append(min(ts) * 1e3)
        alive_frac.append(float(jnp.mean(w[6])))
        ws = jax.block_until_ready(sort_by_alive(*w))
        float(kern(*ws))
        ts = []
        for _ in range(args.iters):
            t0 = time.time()
            float(kern(*ws))
            ts.append(time.time() - t0)
        kernel_sorted_ms.append(min(ts) * 1e3)

    # --- 3. per-bounce TOTAL from the depth profile ----------------------
    @functools.partial(jax.jit, static_argnames=("depth",))
    def frame(o, d, skeys, depth):
        return jnp.sum(trace_flat_world(world, o, d, skeys, depth,
                                        interpret=interp))

    totals = []
    prev = 0.0
    for depth in range(1, args.depth + 1):
        float(frame(o, d, skeys, depth))
        ts = []
        for _ in range(args.iters):
            t0 = time.time()
            float(frame(o, d, skeys, depth))
            ts.append(time.time() - t0)
        t_ms = min(ts) * 1e3
        totals.append(t_ms - prev)
        prev = t_ms

    print(f"# chunk={args.chunk} n={n} depth={args.depth} "
          f"(bounce totals from depth-profile differences)")
    print("bounce  alive%   kernel_ms  kernel_sorted_ms  bounce_total_ms"
          "  glue_ms  glue%")
    for b in range(args.depth):
        tot = totals[b]
        kms = kernel_ms[b]
        glue = tot - kms
        print(f"{b:>6}  {alive_frac[b]*100:>5.1f}  {kms:>9.1f}  "
              f"{kernel_sorted_ms[b]:>16.1f}  "
              f"{tot:>14.1f}  {glue:>7.1f}  {max(glue,0)/max(tot,1e-9):>5.1%}",
              flush=True)


if __name__ == "__main__":
    main()
