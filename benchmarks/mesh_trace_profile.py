"""Per-depth decomposition of the terrain trace: standard [N,3] path vs the
flat-SoA world path, under the current QTRT_MESH_VISIT kernel variant.

    python benchmarks/mesh_trace_profile.py [--mode std|flat] [--depths 1 5]

Used for the round-3 mesh campaign (docs/PERFORMANCE.md): depth=1 isolates
the primary-bounce cost; (depth5 - depth1)/4 approximates the steady
per-bounce cost with a decaying wavefront.
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
    ap.add_argument("--modes", nargs="*", default=["flat", "std"],
                    choices=["std", "flat"])
    ap.add_argument("--depths", nargs="*", type=int, default=[1, 5])
    ap.add_argument("--n", type=int, default=414720)
    ap.add_argument("--chunk", type=int, default=-1,
                    help=">=0: use camera rays of this 1080p frame chunk "
                         "(0-4) instead of random rays")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from qt_raytracer_tpu.core import sampling
    from qt_raytracer_tpu.core.integrator import trace
    from qt_raytracer_tpu.core.integrator_flat import trace_flat_world
    from qt_raytracer_tpu.kernels.mesh_intersect import VISIT_MODE
    from qt_raytracer_tpu.models import meshes

    world = meshes.terrain_world()
    k = jax.random.PRNGKey(7)
    n = args.n
    if args.chunk >= 0:
        # The REAL config-4 wavefront: chunk `c` of the 1080p 1spp frame
        # (camera rays; n must divide the frame into 1024-multiples).
        from qt_raytracer_tpu.core.camera import get_rays
        from qt_raytracer_tpu.core.config import RenderConfig
        from qt_raytracer_tpu.core.render import pixel_grid
        cfg = RenderConfig(width=1920, height=1080, spp=1, max_depth=5)
        cam = meshes.terrain_camera(cfg.aspect_ratio)
        i, j, _ = pixel_grid(cfg)
        base = args.chunk * n
        i, j = i[base:base + n], j[base:base + n]
        o, d = get_rays(cam, (i + 0.5) / cfg.width, (j + 0.5) / cfg.height,
                        jnp.zeros((n,)), jnp.zeros((n,)))
        o = jnp.asarray(o)
        d = jnp.asarray(d)
    else:
        o = jax.random.uniform(k, (n, 3), minval=-4.0, maxval=4.0)
        o = o.at[:, 1].add(3.0)
        d = jax.random.normal(jax.random.fold_in(k, 1), (n, 3))
        d = d / jnp.linalg.norm(d, axis=1, keepdims=True)
    keys = sampling.pixel_states(k, jnp.arange(n, dtype=jnp.uint32), "hash")
    skeys = sampling.sample_keys(keys, 0)

    @functools.partial(jax.jit, static_argnames=("mode", "depth"))
    def run(o, d, skeys, mode, depth):
        if mode == "flat":
            return jnp.sum(trace_flat_world(world, o, d, skeys, depth))
        return jnp.sum(trace(world, o, d, skeys, depth,
                             intersector="pallas"))

    for mode in args.modes:
        for depth in args.depths:
            t0 = time.time()
            float(run(o, d, skeys, mode, depth))
            first = time.time() - t0
            ts = []
            for _ in range(3):
                t0 = time.time()
                float(run(o, d, skeys, mode, depth))
                ts.append(time.time() - t0)
            print(f"{mode}/{VISIT_MODE} depth={depth}: first={first:.1f}s "
                  f"best={min(ts)*1e3:.0f}ms", flush=True)


if __name__ == "__main__":
    main()
