"""Where does the occupancy-insensitive mesh-bounce floor live? (round 5)

The glue split (mesh_glue_split.py) measured the full _world_hit_flat at
~130-170 ms per 414Ki-ray bounce REGARDLESS of live fraction (132 ms at
6.4% alive) — even though mesh_search_pallas already sorts dead rays last
into row_alive-skipped groups. Hypothesis: the kernel's internal sort
PIPELINE (argsort + per-operand gathers + result scatters, all O(N)) is
the floor, not the sweep. This probe times, on each real bounce wavefront
of a 1080p terrain chunk:

  a. mesh_search_pallas sort=True   (shipped path)
  b. mesh_search_pallas sort=False  (scattered dead lanes, no pipeline)
  c. inputs PRE-sorted by sort_keys + sort=False
     (pure sweep at compacted occupancy, zero per-call pipeline)

c << a at low occupancy means the sort pipeline is the residual config-4
lever; a ~= c means the sweep itself has an occupancy-independent floor.

Run on the real chip:  python benchmarks/mesh_sort_cost.py [--chunk 3]
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
    ap.add_argument("--chunk", type=int, default=3)
    ap.add_argument("--n", type=int, default=414720)
    ap.add_argument("--depth", type=int, default=5)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--interpret", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from qt_raytracer_tpu.core import sampling
    from qt_raytracer_tpu.core.camera import get_rays
    from qt_raytracer_tpu.core.config import RenderConfig
    from qt_raytracer_tpu.core.integrator_flat import (_scatter_flat,
                                                       _world_hit_flat, BIG)
    from qt_raytracer_tpu.core.render import pixel_grid
    from qt_raytracer_tpu.kernels.mesh_intersect import (mesh_search_pallas,
                                                         sort_keys)
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
        return (jnp.where(cont, h["px"], ox), jnp.where(cont, h["py"], oy),
                jnp.where(cont, h["pz"], oz), jnp.where(cont, sdx, dx),
                jnp.where(cont, sdy, dy), jnp.where(cont, sdz, dz), cont)

    ox, oy, oz = o[:, 0], o[:, 1], o[:, 2]
    dx, dy, dz = d[:, 0], d[:, 1], d[:, 2]
    alive = jnp.ones((n,), bool)
    waves = [(ox, oy, oz, dx, dy, dz, alive)]
    for depth_idx in range(args.depth - 1):
        ox, oy, oz, dx, dy, dz, alive = step(ox, oy, oz, dx, dy, dz,
                                             alive, skeys, depth_idx)
        jax.block_until_ready(alive)
        waves.append((ox, oy, oz, dx, dy, dz, alive))

    lo = jnp.min(world.mesh.v0, axis=0)
    hi = jnp.max(world.mesh.v0, axis=0)

    @functools.partial(jax.jit, static_argnames=("sort", "pipe"))
    def search(ox, oy, oz, dx, dy, dz, alive, sort, pipe="gather"):
        t, idx = mesh_search_pallas(world.mesh, (ox, oy, oz), (dx, dy, dz),
                                    float(cfg.t_min), interpret=interp,
                                    alive=alive, sort=sort, pipe=pipe)
        live = alive & (t < BIG)
        return (jnp.sum(jnp.where(live, t, 0.0))
                + jnp.sum(jnp.where(live, idx, 0)))

    @jax.jit
    def presort(ox, oy, oz, dx, dy, dz, alive):
        key = sort_keys((ox, oy, oz), (dx, dy, dz), alive, lo, hi)
        perm = jnp.argsort(key, stable=True)
        g = lambda x: x[perm]
        return g(ox), g(oy), g(oz), g(dx), g(dy), g(dz), alive[perm]

    def timed(fn, *a):
        float(fn(*a))
        ts = []
        for _ in range(args.iters):
            t0 = time.time()
            float(fn(*a))
            ts.append(time.time() - t0)
        return min(ts) * 1e3

    print(f"# chunk={args.chunk} n={n} (mesh_search_pallas only; "
          f"a=sort-on b=sort-off c=presorted+sort-off f=sort-on-fused-pipe)")
    print("bounce  alive%    a_ms    b_ms    c_ms    f_ms")
    for b, w in enumerate(waves):
        af = float(jnp.mean(w[6])) * 100
        a_ms = timed(lambda *x: search(*x, sort=True), *w)
        b_ms = timed(lambda *x: search(*x, sort=False), *w)
        ws = jax.block_until_ready(presort(*w))
        c_ms = timed(lambda *x: search(*x, sort=False), *ws)
        f_ms = timed(lambda *x: search(*x, sort=True, pipe="fused"), *w)
        print(f"{b:>6}  {af:>5.1f}  {a_ms:>6.1f}  {b_ms:>6.1f}  "
              f"{c_ms:>6.1f}  {f_ms:>6.1f}", flush=True)


if __name__ == "__main__":
    main()
