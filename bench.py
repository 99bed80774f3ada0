"""Headline benchmark: full-frame path tracing throughput on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Workload: the book-cover random scene (reference RayTracer.h:599-643) at
1920x1080, 1 spp, max_depth 10 — the BASELINE.md "rays/s/chip at 1spp 1080p"
config. Throughput metric = Msamples/s = W*H*spp / elapsed, the reference's
own formula (src/app/RayTracerFboItem.cpp:400-404).

vs_baseline: the reference publishes no numbers (BASELINE.md), so the
comparison anchor is a nominal 10 Msamples/s — a generous estimate for the
reference's multithreaded CPU tracer on a desktop workstation (its only
backend that renders this scene; the GPU backends hardcode a 4-sphere scene).
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_MSAMPLES = 10.0


def main() -> None:
    from qt_raytracer_tpu import RenderConfig
    from qt_raytracer_tpu.core.render import render_linear
    from qt_raytracer_tpu.models import scenes
    from qt_raytracer_tpu.runtime.compile_cache import enable_compilation_cache

    enable_compilation_cache()

    cfg = RenderConfig(width=1920, height=1080, spp=1, max_depth=10,
                       # pixel_chunk=0 -> auto heuristic (resolve_pixel_chunk:
                       # 5 x 414720-ray chunks at 1080p, multiples of the
                       # 1024-ray Pallas tile); intersector auto -> fused on
                       # TPU (flat-SoA integrator + fused hit kernel).
                       rng="hash")          # counter-hash RNG (fast path)
    scene, camera = scenes.get_scene("random", cfg.aspect_ratio)
    key = jax.random.PRNGKey(0)

    dev = jax.devices()[0]

    # Sync by fetching a dependent scalar, NOT jax.block_until_ready(image):
    # through the axon tunnel block_until_ready materializes the whole 25 MB
    # frame on the host (~2.7 s), which measures the tunnel, not the chip.
    # The image stays on device — as it would in the preview/training paths.
    def sync(img):
        return float(jnp.sum(img))

    t0 = time.time()
    out = render_linear(scene, camera, cfg, key)
    mean_probe = sync(out) / (cfg.width * cfg.height * 3)
    compile_and_first = time.time() - t0

    iters = 4
    keys = [jax.block_until_ready(jax.random.fold_in(key, it))
            for it in range(iters)]  # precompute: eager fold_in is a tunnel
    #                                  round-trip that must not be timed
    t0 = time.time()
    for k in keys:
        out = render_linear(scene, camera, cfg, k)
    sync(out)
    elapsed = (time.time() - t0) / iters

    samples = cfg.width * cfg.height * cfg.spp
    msamples = samples / elapsed / 1e6
    result = {
        "metric": "path_trace_throughput_1080p_1spp_d10",
        "value": round(msamples, 3),
        "unit": "Msamples/s/chip",
        "vs_baseline": round(msamples / BASELINE_MSAMPLES, 3),
    }
    # Context lines on stderr-style extra keys are not allowed; keep the one
    # JSON line contract and put extras after it on separate lines.
    print(json.dumps(result))
    print(f"# device={dev.platform}:{getattr(dev, 'device_kind', '?')} "
          f"first_call_s={compile_and_first:.1f} steady_s={elapsed:.3f} "
          f"mean={mean_probe:.4f}")


if __name__ == "__main__":
    main()
