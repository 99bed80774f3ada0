"""Component microbenchmarks for the headline bounce loop.

Times each piece of one bounce at headline chunk size on the current
device, so optimization work targets measured cost, not guesses.

The axon tunnel adds ~30 ms dispatch+fetch latency per jit call, so each op
is repeated R times INSIDE one jit (lax.scan, inputs perturbed per step to
defeat CSE) and the per-op time is (total - overhead) / R with overhead
estimated from an empty scan.

Run: python benchmarks/microbench.py [N]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

R = 16  # repetitions inside one jit


def fetch(x):
    return float(jnp.sum(x))


def scan_time(step, iters=3, warmup=1):
    """step(i) -> scalar f32 contribution; returns ms per step call."""

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
    return (time.time() - t0) / iters / R * 1e3  # ms per op


def main() -> None:
    from qt_raytracer_tpu.core import materials, sampling
    from qt_raytracer_tpu.core.intersect import (intersect_spheres,
                                                 packed_param_table)
    from qt_raytracer_tpu.core.integrator import trace
    from qt_raytracer_tpu.kernels.sphere_intersect import sphere_search_pallas
    from qt_raytracer_tpu.models import scenes

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 414720
    scene, camera = scenes.get_scene("random", 16 / 9)
    key = jax.random.PRNGKey(0)
    ko, kd, ka = jax.random.split(key, 3)
    origins = jax.random.normal(ko, (n, 3)) * 3.0
    directions = jax.random.normal(kd, (n, 3))
    alive_half = jax.random.uniform(ka, (n,)) < 0.5
    alive_all = jnp.ones((n,), bool)
    sample_keys = jax.random.split(key, n)
    idx = jax.random.randint(key, (n,), 0, scene.num_spheres)

    dev = jax.devices()[0]
    print(f"# device={dev.platform} N={n} S={scene.num_spheres} R={R}")

    base = scan_time(lambda i: jnp.float32(0.0) * i)
    print(f"empty scan step overhead:   {base:8.3f} ms")

    def perturb(i):
        return origins + (i.astype(jnp.float32) * 1e-6)

    def t_search(i):
        t, _ = sphere_search_pallas(scene, perturb(i), directions, 1e-3,
                                    alive=alive_all)
        return jnp.sum(t * 1e-30)

    def t_search_half(i):
        t, _ = sphere_search_pallas(scene, perturb(i), directions, 1e-3,
                                    alive=alive_half)
        return jnp.sum(t * 1e-30)

    def t_gather(i):
        p = packed_param_table(scene)[(idx + i) % scene.num_spheres]
        return jnp.sum(p * 1e-30)

    def t_isect(i):
        h = intersect_spheres(scene, perturb(i), directions, 1e-3,
                              backend="pallas", alive=alive_all)
        return jnp.sum(h.t * 1e-30) + jnp.sum(h.normal * 1e-30) + jnp.sum(h.albedo * 1e-30)

    def t_uniforms(i):
        u = sampling.stream_uniforms(sample_keys, sampling.STREAM_BOUNCE0 + i,
                                     sampling.UNIFORMS_PER_BOUNCE)
        return jnp.sum(u * 1e-30)

    hits = jax.jit(lambda: intersect_spheres(
        scene, origins, directions, 1e-3, backend="pallas",
        alive=alive_all))()
    uniforms = jax.jit(lambda: sampling.stream_uniforms(
        sample_keys, sampling.STREAM_BOUNCE0,
        sampling.UNIFORMS_PER_BOUNCE))()

    def t_scatter(i):
        sc = materials.scatter(hits.mat_type, hits.albedo, hits.fuzz,
                               hits.ior, hits.emission,
                               directions, hits.normal, hits.front_face,
                               uniforms + i.astype(jnp.float32) * 1e-7)
        return jnp.sum(sc.direction * 1e-30) + jnp.sum(sc.attenuation * 1e-30)

    for name, step in [("pallas search (all alive)", t_search),
                       ("pallas search (50% alive)", t_search_half),
                       ("packed param gather [S,16]", t_gather),
                       ("intersect full", t_isect),
                       ("stream_uniforms (threefry)", t_uniforms),
                       ("materials.scatter", t_scatter)]:
        print(f"{name:28s}{max(scan_time(step) - base, 0.0):8.3f} ms")

    # Full trace: one jit call, overhead negligible at this size.
    tr = jax.jit(lambda o: trace(scene, o, directions, sample_keys,
                                 max_depth=10, intersector="pallas"))
    trs = jax.jit(lambda o: jnp.sum(tr(o)))
    fetch(trs(origins))
    t0 = time.time()
    for it in range(3):
        fetch(trs(origins + it * 1e-6))
    print(f"{'trace d10 (threefry)':28s}{(time.time()-t0)/3*1e3:8.3f} ms")


if __name__ == "__main__":
    main()
