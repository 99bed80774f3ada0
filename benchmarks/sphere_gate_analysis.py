"""Upper-bound analysis for sphere cluster culling on the HEADLINE workload
(VERDICT r2 item 4 / roadmap 2: retry culling WITH the octant sort).

Traces the real book-cover wavefront (CPU, small frame), collects every
bounce's (o, d, alive), and reports — per 128-ray row, unsorted vs
octant/Morton-sorted vs crossing-sorted — the mean fraction of 64-sphere
chunks whose slab gate passes. The culling win is bounded by
1 / gated_fraction on the (S,B) sweep; the sort tax (per-bounce argsort +
8 input gathers + 19 output scatters through XLA relayouts, measured
separately) must beat it for the lever to pay.

    env PYTHONPATH= JAX_PLATFORMS=cpu python benchmarks/sphere_gate_analysis.py
"""

from __future__ import annotations

import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main() -> None:
    import jax
    import jax.numpy as jnp

    from qt_raytracer_tpu import RenderConfig
    from qt_raytracer_tpu.core import sampling
    from qt_raytracer_tpu.core.camera import get_rays
    from qt_raytracer_tpu.core.integrator import trace
    from qt_raytracer_tpu.core.render import pixel_grid
    from qt_raytracer_tpu.kernels.mesh_intersect import sort_keys
    from qt_raytracer_tpu.models import scenes

    cfg = RenderConfig(width=192, height=108, spp=1, max_depth=10)
    scene, cam = scenes.get_scene("random", cfg.aspect_ratio)
    key = jax.random.PRNGKey(0)

    i, j, _ = pixel_grid(cfg)
    pk = sampling.pixel_keys(key, i.shape[0])
    sk = sampling.sample_keys(pk, 0)
    gen = sampling.stream_uniforms(sk, sampling.STREAM_GEN,
                                   sampling.UNIFORMS_GEN)
    s = (i + gen[:, 0]) / (cfg.width - 1)
    t = (j + gen[:, 1]) / (cfg.height - 1)
    o0, d0 = get_rays(cam, s, t, gen[:, 2], gen[:, 3])

    # Capture per-bounce wavefront state by re-running trace with a tap.
    states = []

    from qt_raytracer_tpu.core import integrator as integ

    orig = integ.intersect_world

    def tap(world, o, d, t_min, **kw):
        alive = kw.get("alive")
        states.append((np.asarray(o), np.asarray(d),
                       np.ones(o.shape[0], bool) if alive is None
                       else np.asarray(alive)))
        return orig(world, o, d, t_min, **kw)

    integ.intersect_world = tap
    try:
        with jax.disable_jit():
            trace(scene, o0, d0, sk, cfg.max_depth, cfg.t_min,
                  intersector="xla")
    finally:
        integ.intersect_world = orig

    # Chunk AABBs over the Morton-ordered padded scene (CHUNK_S = 64).
    c = np.asarray(scene.center)
    r = np.asarray(scene.radius)
    act = np.asarray(scene.active)
    CHUNK = 64
    s_pad = c.shape[0]
    k = s_pad // CHUNK
    lo = np.where(act[:, None], c - r[:, None], np.inf).reshape(k, CHUNK, 3)
    hi = np.where(act[:, None], c + r[:, None], -np.inf).reshape(k, CHUNK, 3)
    blo, bhi = lo.min(1), hi.max(1)
    real = np.isfinite(blo).all(1)
    scene_lo = jnp.asarray(blo[real].min(0))
    scene_hi = jnp.asarray(bhi[real].max(0))

    def gated_fraction(o, d, alive, order=None):
        if order is not None:
            o, d, alive = o[order], d[order], alive[order]
        n = (o.shape[0] // 128) * 128
        o, d, alive = o[:n].reshape(-1, 128, 3), d[:n].reshape(-1, 128, 3), \
            alive[:n].reshape(-1, 128)
        inv = 1.0 / np.where(np.abs(d) < 1e-30,
                             np.where(d < 0, -1e-30, 1e-30), d)
        t0 = (blo[None, None] - o[:, :, None]) * inv[:, :, None]  # [R,128,k,3]
        t1 = (bhi[None, None] - o[:, :, None]) * inv[:, :, None]
        enter = np.minimum(t0, t1).max(-1)
        exit_ = np.maximum(t0, t1).min(-1)
        hit = (exit_ > np.maximum(enter, 1e-3)) & alive[:, :, None] \
            & real[None, None]
        row_live = alive.any(1)
        row_gate = hit.any(1)[row_live]          # [rows, k]
        return row_gate.mean(), row_live.mean()

    print(f"# spheres={int(act.sum())} padded={s_pad} chunks={k} "
          f"(real {int(real.sum())})")
    for b, (o, d, alive) in enumerate(states):
        if not alive.any():
            break
        f_uns, occ = gated_fraction(o, d, alive)
        keys = np.asarray(sort_keys(
            jnp.asarray(o), jnp.asarray(d), jnp.asarray(alive),
            scene_lo, scene_hi))
        f_srt, _ = gated_fraction(o, d, alive, order=np.argsort(keys))
        print(f"bounce {b}: alive={alive.mean():.3f} "
              f"row_occupancy={occ:.3f} gated_unsorted={f_uns:.3f} "
              f"gated_sorted={f_srt:.3f}", flush=True)


if __name__ == "__main__":
    main()
