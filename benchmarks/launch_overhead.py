"""Per-launch fixed cost of both Pallas kernels (roadmap 1 sizing).

The proposal (docs/PERFORMANCE.md roadmap 1): merge the NEE shadow search
into the bounce search — one 2N-ray launch instead of two N-ray launches
per bounce (4 -> 2 launches/bounce on mesh worlds). Search WORK is linear
in rows either way (both kernels skip dead 128-lane groups after the
dead-last sort), so the merge can only save the per-launch FIXED cost.

This script measures that fixed cost directly: time per scan-amortized
launch at N=1024 (one 8-row grid step) vs N=414720, fit
time = fixed + slope*N, and report fixed as the per-launch saving bound.

Run on the real chip:  python benchmarks/launch_overhead.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

R = 16


def fetch(x):
    return float(jnp.sum(x))


def scan_time(step, iters=3, warmup=1):
    @jax.jit
    def run():
        def body(acc, i):
            return acc + step(i), None
        acc, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(R))
        return acc

    for _ in range(warmup):
        fetch(run())
    t0 = time.time()
    for _ in range(iters):
        fetch(run())
    return (time.time() - t0) / iters / R * 1e3


def main() -> None:
    from qt_raytracer_tpu.kernels.fused_hit import fused_hit_pallas
    from qt_raytracer_tpu.kernels.mesh_intersect import mesh_search_pallas
    from qt_raytracer_tpu.models import scenes

    sph_scene, _ = scenes.get_scene("random", 16 / 9)
    world, _ = scenes.get_scene("cornell_mesh", 1.0)

    base = scan_time(lambda i: jnp.float32(0.0) * i)
    print(f"# device={jax.devices()[0].platform} R={R}  "
          f"empty-step {base:.3f} ms")

    sizes = (1024, 414720)
    for label, fn in (
        ("fused sphere (shadow_only)", lambda o, d, a: fused_hit_pallas(
            sph_scene.spheres if hasattr(sph_scene, "spheres") else sph_scene,
            o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2], a,
            1e-3, shadow_only=True)["t"]),
        # sort=False pins BOTH fit sizes to the same (unsorted) code path:
        # N=1024 sits below the n>=2048 sort threshold, so letting the sort
        # engage only at N=414720 would fold its pipeline cost into the
        # fitted per-launch intercept. (Single-cluster Cornell skips the
        # sort anyway; explicit so the fit stays valid for any mesh.)
        ("mesh search (cornell)", lambda o, d, a: mesh_search_pallas(
            world.mesh, (o[:, 0], o[:, 1], o[:, 2]),
            (d[:, 0], d[:, 1], d[:, 2]), 1e-3, alive=a, sort=False)[0]),
    ):
        times = []
        for n in sizes:
            ko, kd = jax.random.split(jax.random.PRNGKey(n), 2)
            o = jax.random.normal(ko, (n, 3)) * 2.0
            d = jax.random.normal(kd, (n, 3))
            a = jnp.ones((n,), bool)

            def step(i, o=o, d=d, a=a, fn=fn):
                return jnp.sum(fn(o + i.astype(jnp.float32) * 1e-6, d, a)
                               * 1e-30)

            t = max(scan_time(step) - base, 0.0)
            times.append(t)
            print(f"{label:28s} N={n:7d}: {t:8.3f} ms")
        slope = (times[1] - times[0]) / (sizes[1] - sizes[0])
        fixed = max(times[0] - slope * sizes[0], 0.0)
        print(f"{label:28s} fixed/launch ~= {fixed:.3f} ms  "
              f"(merge saving bound per avoided launch)")


if __name__ == "__main__":
    main()
