"""Single-session A/B of mesh-kernel visit variants on the real chip
(immune to tunnel session variance). Times the bare clustered kernel on
coherent primary rays and incoherent random rays per variant.

    python benchmarks/mesh_visit_ab.py [--n 414720] [--iters 5]
"""

from __future__ import annotations

import argparse
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=414720)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--variants", nargs="*",
                    default=["full", "subtile", "sliced", "rowgate"])
    ap.add_argument("--sorts", nargs="*", default=["crossing"],
                    help="sort_mode values crossed with --variants")
    ap.add_argument("--rows", type=int, default=0,
                    help="QTRT_CLUSTER_ROWS override (set before import)")
    args = ap.parse_args()
    if args.rows:
        import os
        os.environ["QTRT_CLUSTER_ROWS"] = str(args.rows)

    import jax
    import jax.numpy as jnp

    from qt_raytracer_tpu.core.camera import get_rays
    from qt_raytracer_tpu.core.config import RenderConfig
    from qt_raytracer_tpu.core.render import pixel_grid
    from qt_raytracer_tpu.kernels.mesh_intersect import mesh_search_pallas
    from qt_raytracer_tpu.models import meshes

    dev = jax.devices()[0]
    print(f"# device={dev.platform}:{dev.device_kind}", flush=True)

    cfg = RenderConfig(width=1920, height=1080, spp=1, max_depth=5,
                       rng="hash")
    world = meshes.terrain_world()
    cam = meshes.terrain_camera(cfg.aspect_ratio)
    mesh = world.mesh
    n = args.n

    i, j, _ = pixel_grid(cfg)
    lo = cfg.width * (cfg.height // 2)
    i, j = i[lo:lo + n], j[lo:lo + n]
    o_p, d_p = get_rays(cam, (i + 0.5) / cfg.width, (j + 0.5) / cfg.height,
                        jnp.zeros((n,)), jnp.zeros((n,)))
    k = jax.random.PRNGKey(7)
    o_r = jax.random.uniform(k, (n, 3), minval=-4.0, maxval=4.0)
    o_r = o_r.at[:, 1].add(3.0)
    d_r = jax.random.normal(jax.random.fold_in(k, 1), (n, 3))
    d_r = d_r / jnp.linalg.norm(d_r, axis=1, keepdims=True)

    def sync(t, idx):
        return float(jnp.sum(jnp.where(t < 1e30, t, 0.0)) + jnp.sum(idx % 7))

    probes = {}
    for variant in args.variants:
        for sort_mode in args.sorts:
            for name, o, d in [("primary", o_p, d_p), ("random", o_r, d_r)]:
                def run():
                    return mesh_search_pallas(mesh, o, d, 1e-3,
                                              visit=variant,
                                              sort_mode=sort_mode)
                t0 = time.time()
                s = sync(*run())
                first = time.time() - t0
                times = []
                for _ in range(args.iters):
                    t0 = time.time()
                    sync(*run())
                    times.append(time.time() - t0)
                best = min(times)
                # Cross-variant probe equality = bitwise-identical outputs
                # on this workload (the interpret-mode test asserts it
                # exactly).
                ok = ""
                if name in probes and abs(probes[name] - s) > 0:
                    ok = "  PROBE MISMATCH vs first config!"
                probes.setdefault(name, s)
                print(f"{variant:8s} {sort_mode:9s} {name:8s}: "
                      f"first={first:.2f}s best={best*1e3:.1f}ms "
                      f"({n/best/1e6:.1f} Mrays/s) probe={s:.6g}{ok}",
                      flush=True)


if __name__ == "__main__":
    main()
