"""Measured ceiling for the double-buffered chunk pipeline (roadmap 6).

The proposal (VERDICT r2 item 4, docs/PERFORMANCE.md roadmap 2): overlap
chunk k+1's ray generation (pixel keys -> STREAM_GEN uniforms -> thin-lens
get_rays) with chunk k's bounce search, since lax.map serializes chunks.

Two facts bound the lever, one architectural and one measured:

  1. A TPU core runs ONE HLO at a time — there is no compute/compute
     concurrency between fused regions (only async DMA and collectives
     overlap compute). Ray-gen is VPU work (hash/threefry + FMA chains),
     the search kernel is VPU work: even a perfect software pipeline
     executes them back-to-back on the same unit. The overlap win is
     therefore bounded by scheduling slack, not by the ray-gen cost.

  2. This script MEASURES the total non-search share at headline
     conditions: per-chunk ray-gen (the only work a double-buffer could
     hide) vs the full chunk step (ray-gen + depth-10 fused trace).
     ceiling = raygen / full  — if compute/compute overlap existed at all.

Run on the real chip:  python benchmarks/raygen_overlap_bound.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

R = 8  # scan repetitions inside one jit (amortizes tunnel dispatch)


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
    return (time.time() - t0) / iters / R * 1e3  # ms per step


def main() -> None:
    from qt_raytracer_tpu.core import camera as cam_mod
    from qt_raytracer_tpu.core import sampling
    from qt_raytracer_tpu.core.config import RenderConfig
    from qt_raytracer_tpu.core.integrator_flat import trace_flat
    from qt_raytracer_tpu.core.render import pixel_grid, resolve_pixel_chunk
    from qt_raytracer_tpu.models import scenes

    cfg = RenderConfig(width=1920, height=1080, spp=1, max_depth=10,
                       rng="hash")
    scene, camera = scenes.get_scene("random", cfg.aspect_ratio)
    key = jax.random.PRNGKey(0)
    i_all, j_all, pixel_index = pixel_grid(cfg)
    pix_keys_all = sampling.pixel_states(key, pixel_index, cfg.rng)
    chunk = resolve_pixel_chunk(cfg)
    pix_keys = pix_keys_all[:chunk]
    i_c, j_c = i_all[:chunk], j_all[:chunk]

    dev = jax.devices()[0]
    print(f"# device={dev.platform} chunk={chunk} depth={cfg.max_depth} "
          f"rng={cfg.rng} R={R}")

    base = scan_time(lambda i: jnp.float32(0.0) * i)
    print(f"empty scan step overhead: {base:8.3f} ms")

    inv_w = 1.0 / max(cfg.width - 1, 1)
    inv_h = 1.0 / max(cfg.height - 1, 1)

    def raygen(batch_idx):
        """Everything a double-buffer could prefetch for chunk k+1."""
        samp_keys = sampling.sample_keys(pix_keys, batch_idx)
        gen = sampling.stream_uniforms(samp_keys, sampling.STREAM_GEN,
                                       sampling.UNIFORMS_GEN)
        s = (i_c + gen[:, 0]) * inv_w
        t = (j_c + gen[:, 1]) * inv_h
        origins, directions = cam_mod.get_rays(camera, s, t,
                                               gen[:, 2], gen[:, 3])
        return samp_keys, origins, directions

    def t_raygen(i):
        samp_keys, origins, directions = raygen(i.astype(jnp.uint32))
        return (jnp.sum(origins * 1e-30) + jnp.sum(directions * 1e-30)
                + jnp.sum(samp_keys.astype(jnp.float32) * 1e-30))

    def t_full(i):
        samp_keys, origins, directions = raygen(i.astype(jnp.uint32))
        rad = trace_flat(scene, origins, directions, samp_keys,
                         max_depth=cfg.max_depth)
        return jnp.sum(rad * 1e-30)

    rg = max(scan_time(t_raygen) - base, 0.0)
    full = max(scan_time(t_full) - base, 0.0)
    print(f"ray-gen (keys+uniforms+get_rays): {rg:8.3f} ms")
    print(f"full chunk step (raygen+trace d10): {full:8.3f} ms")
    print(f"double-buffer ceiling (raygen share): {100.0 * rg / full:.2f}% "
          f"— and compute/compute overlap does not exist on a TPU core")


if __name__ == "__main__":
    main()
