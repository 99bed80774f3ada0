"""Terrain config-4 frame A/B in ONE session: std [N,3] path vs flat-SoA
world path (and any QTRT_MESH_* variant), immune to tunnel session variance.

    python benchmarks/mesh_frame_ab.py [--scale 1.0] [--iters 3]
"""

from __future__ import annotations

import argparse
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=float, default=1.0)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--modes", nargs="*", default=["flat", "std"])
    args = ap.parse_args()

    import dataclasses as dc

    import jax
    import jax.numpy as jnp

    from qt_raytracer_tpu import RenderConfig
    from qt_raytracer_tpu.core.render import render_linear
    from qt_raytracer_tpu.models import meshes

    w = max(int(1920 * args.scale), 64)
    h = max(int(1080 * args.scale), 36)
    world = meshes.terrain_world()
    base = RenderConfig(width=w, height=h, spp=1, max_depth=5, rng="hash")
    cam = meshes.terrain_camera(base.aspect_ratio)
    key = jax.random.PRNGKey(0)

    for mode in args.modes:
        # "std" forces the [N,3] integrator + v1 mesh kernel; "flat" is the
        # default fused dispatch (trace_flat_world) on TPU.
        cfg = base if mode == "flat" else dc.replace(base,
                                                     intersector="pallas")
        img = render_linear(world, cam, cfg, key)
        float(jnp.sum(img))                      # compile + sync
        ts = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            img = render_linear(world, cam, cfg, key)
            float(jnp.sum(img))
            ts.append(time.perf_counter() - t0)
        best = min(ts)
        print(f"{mode}: best={best:.3f}s "
              f"{w * h * 1 / best / 1e6:.2f} Msamples/s", flush=True)


if __name__ == "__main__":
    main()
