"""Mesh kernel profiling harness (VERDICT r1 item 1: close the mesh gap).

Times (a) the bare clustered mesh kernel on coherent primary rays and on
incoherent random rays, and (b) the full terrain frame (BASELINE config 4
conditions). Run on the real chip:

    python benchmarks/mesh_kernel_bench.py [--rows N] [--frame]

QTRT_CLUSTER_ROWS is honored via --rows (sets the env var BEFORE import).
"""

from __future__ import annotations

import argparse
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=0,
                    help="QTRT_CLUSTER_ROWS override")
    ap.add_argument("--frame", action="store_true",
                    help="also time the full 1080p terrain frame")
    ap.add_argument("--n", type=int, default=414720, help="rays per call")
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--no-sort", action="store_true",
                    help="disable the wavefront coherence sort")
    ap.add_argument("--kernel", default="pairs",
                    choices=["pairs", "clustered"],
                    help="mesh intersector (also sets QTRT_MESH_KERNEL "
                         "for the --frame render path)")
    args = ap.parse_args()
    if args.rows:
        os.environ["QTRT_CLUSTER_ROWS"] = str(args.rows)
    os.environ["QTRT_MESH_KERNEL"] = args.kernel

    import jax
    import jax.numpy as jnp

    from qt_raytracer_tpu.core.camera import get_rays
    from qt_raytracer_tpu.core.config import RenderConfig
    from qt_raytracer_tpu.core.render import pixel_grid, render_linear
    from qt_raytracer_tpu.kernels.mesh_intersect import (
        CLUSTER_ROWS, mesh_search_pallas)
    from qt_raytracer_tpu.kernels.mesh_pairs import mesh_search_pairs

    if args.kernel == "pairs":
        def search(mesh, o, d, t_min, sort=True):
            return mesh_search_pairs(mesh, o, d, t_min)
    else:
        search = mesh_search_pallas
    from qt_raytracer_tpu.models import meshes

    dev = jax.devices()[0]
    print(f"# device={dev.platform}:{dev.device_kind} rows={CLUSTER_ROWS}",
          flush=True)

    cfg = RenderConfig(width=1920, height=1080, spp=1, max_depth=5,
                       rng="hash")
    world = meshes.terrain_world()
    cam = meshes.terrain_camera(cfg.aspect_ratio)
    mesh = world.mesh
    n = args.n

    # Coherent primary rays: a middle band of the 1080p frame (the terrain
    # fills the lower 2/3; the top rows are sky and would measure 0 hits).
    i, j, _ = pixel_grid(cfg)
    lo = cfg.width * (cfg.height // 2)
    i, j = i[lo:lo + n], j[lo:lo + n]
    o_p, d_p = get_rays(cam, (i + 0.5) / cfg.width, (j + 0.5) / cfg.height,
                        jnp.zeros((n,)), jnp.zeros((n,)))
    # Incoherent rays: random origins above the terrain, random directions.
    k = jax.random.PRNGKey(7)
    o_r = jax.random.uniform(k, (n, 3), minval=-4.0, maxval=4.0)
    o_r = o_r.at[:, 1].add(3.0)
    d_r = jax.random.normal(jax.random.fold_in(k, 1), (n, 3))
    d_r = d_r / jnp.linalg.norm(d_r, axis=1, keepdims=True)

    def sync(t, idx):
        return float(jnp.sum(jnp.where(t < 1e30, t, 0.0)) + jnp.sum(idx % 7))

    for name, o, d in [("primary", o_p, d_p), ("random", o_r, d_r)]:
        t0 = time.time()
        t, idx = search(mesh, o, d, 1e-3, sort=not args.no_sort)
        s = sync(t, idx)
        first = time.time() - t0
        times = []
        for _ in range(args.iters):
            t0 = time.time()
            t, idx = search(mesh, o, d, 1e-3, sort=not args.no_sort)
            sync(t, idx)
            times.append(time.time() - t0)
        best = min(times)
        hits = float(jnp.mean(t < 1e30))
        print(f"{name}: first={first:.2f}s best={best*1e3:.1f}ms "
              f"({n/best/1e6:.1f} Mrays/s) hit_rate={hits:.3f} probe={s:.3g}",
              flush=True)

    if args.frame:
        key = jax.random.PRNGKey(0)
        t0 = time.time()
        img = render_linear(world, cam, cfg, key)
        probe = float(jnp.sum(img))
        first = time.time() - t0
        times = []
        for it in range(3):
            kk = jax.block_until_ready(jax.random.fold_in(key, it))
            t0 = time.time()
            img = render_linear(world, cam, cfg, kk)
            float(jnp.sum(img))
            times.append(time.time() - t0)
        best = min(times)
        ms = cfg.width * cfg.height * cfg.spp / best / 1e6
        print(f"frame_1080p_d5: first={first:.1f}s best={best:.2f}s "
              f"{ms:.2f} Msamples/s probe={probe:.4g}", flush=True)


if __name__ == "__main__":
    main()
