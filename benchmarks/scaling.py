"""Scaling-efficiency harness (north star: >= 90% rays/s, 1 -> N hosts).

Measures sharded-render throughput across mesh sizes. On a real pod slice
run one process per host (docs/MULTIHOST.md); on a dev machine,
--virtual N simulates N devices on CPU — useful for validating the harness
and the collective paths, NOT for real efficiency numbers (virtual devices
share one socket's FLOPs).

    python benchmarks/scaling.py --virtual 8 --devices 1 2 4 8

Prints one JSON line per device count with throughput and the efficiency
relative to the single-device run.
"""

from __future__ import annotations

import argparse
import json
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--virtual", type=int, default=0,
                    help="simulate N CPU devices (validation only)")
    ap.add_argument("--devices", nargs="*", type=int, default=None)
    ap.add_argument("--width", type=int, default=512)
    ap.add_argument("--height", type=int, default=512)
    ap.add_argument("--spp", type=int, default=8)
    ap.add_argument("--depth", type=int, default=6)
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    if args.virtual:
        os.environ["XLA_FLAGS"] = (
            f"--xla_force_host_platform_device_count={args.virtual} "
            + os.environ.get("XLA_FLAGS", ""))
        import jax
        jax.config.update("jax_platforms", "cpu")
    else:
        import jax

    from qt_raytracer_tpu import RenderConfig
    from qt_raytracer_tpu.models import scenes
    from qt_raytracer_tpu.parallel.sharding import (make_mesh,
                                                    render_linear_sharded)

    cfg = RenderConfig(width=args.width, height=args.height, spp=args.spp,
                       max_depth=args.depth, rng="hash")
    scene, cam = scenes.get_scene("random", cfg.aspect_ratio)
    key = jax.random.PRNGKey(0)
    total = len(jax.devices())
    counts = args.devices or [n for n in (1, 2, 4, 8, 16, 32) if n <= total]

    base = None
    for n in counts:
        mesh = make_mesh(sp=1, px=n, devices=jax.devices()[:n])
        out = render_linear_sharded(scene, cam, cfg, key, mesh)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = render_linear_sharded(scene, cam, cfg, key, mesh)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / args.iters
        ms = cfg.width * cfg.height * cfg.spp / dt / 1e6
        if base is None:
            base = ms
        print(json.dumps({
            "devices": n, "elapsed_s": round(dt, 4),
            "msamples_per_s": round(ms, 3),
            "efficiency_vs_1": round(ms / (base * n), 3),
            "virtual": bool(args.virtual),
        }))


if __name__ == "__main__":
    main()
