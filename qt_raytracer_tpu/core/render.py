"""Top-level render API: render(scene, camera, config, key) -> image.

Replaces the reference's render orchestration (RenderWorker tile loop,
src/app/RayTracerFboItem.cpp:46-143): tiles + a dynamic work queue become a
flat SoA ray batch (the chips are SPMD — sharding lives in parallel/), and the
per-pixel sample loop becomes a ``lax.scan`` over sample batches with a donated
accumulator.

Pixel conventions match the reference exactly (RayTracerFboItem.cpp:102-127):
row 0 is the TOP of the image, the viewport v coordinate uses j = height-1-row,
u = (i + jitter)/(width-1), v = (j + jitter)/(height-1).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from . import camera as cam_mod
from . import sampling, tonemap
from .config import RenderConfig
from .integrator import trace
from .scene import SphereScene


def resolve_intersector(cfg: RenderConfig) -> str:
    """Map cfg.intersector "auto" to the platform default: the fused Pallas
    fast path on TPU (falls back to the v1 kernel for mesh worlds inside
    _trace_dispatch), the portable XLA search elsewhere. Gradient renders
    must not use "fused" (forward-only); diff/inverse pins a grad-capable
    backend and trace_flat's custom_vjp raises if differentiated anyway."""
    if cfg.intersector != "auto":
        return cfg.intersector
    return "fused" if jax.default_backend() == "tpu" else "xla"


# Auto-chunk heuristic constants (the chooseTileSize/chooseMaxUploadsPerFrame
# analog, RayTracerFboItem.cpp:793-848, re-derived for TPU economics):
#   - chunks must be multiples of the 1024-ray Pallas tile or XLA pads +
#     copies every kernel operand per bounce (measured 601 -> 465 ms/frame);
#   - ~400Ki-ray chunks hit the sweet spot at 1080p (4-5 chunks; measured
#     best across 1..8 on v5e, docs/PERFORMANCE.md);
#   - below 256Ki rays one launch underfills the chip already — don't split.
_CHUNK_TILE = 1024
_CHUNK_TARGET = 414720          # ~405 tiles; 5 chunks at 1920x1080
_CHUNK_MIN_RAYS = 262144


def resolve_pixel_chunk(cfg: RenderConfig) -> int:
    """Effective pixel chunk size: cfg.pixel_chunk, or the auto heuristic
    when it is 0 (-1 disables chunking). Returns 0 for "no chunking"."""
    if cfg.pixel_chunk > 0:
        return cfg.pixel_chunk
    if cfg.pixel_chunk < 0:
        return 0
    n = cfg.num_pixels
    if n < _CHUNK_MIN_RAYS:
        return 0
    n_chunks = max(2, round(n / _CHUNK_TARGET))
    per_chunk = -(-n // n_chunks)
    return -(-per_chunk // _CHUNK_TILE) * _CHUNK_TILE


def _trace_dispatch(scene, origins, directions, samp_keys, cfg: RenderConfig):
    """Route to the flat-SoA fast path ("fused"/"fused_interpret", sphere
    scenes) or the general [N,3] integrator. Both produce the same estimator
    on the same RNG stream; the flat path is forward-only (bench/preview),
    mesh worlds and gradient renders take the general path."""
    backend = resolve_intersector(cfg)
    if backend in ("fused", "fused_interpret", "fused_diff",
                   "fused_diff_interpret"):
        if isinstance(scene, SphereScene):
            from .integrator_flat import trace_flat

            return trace_flat(scene, origins, directions, samp_keys,
                              cfg.max_depth, cfg.t_min, nee=cfg.nee,
                              rr_start=cfg.rr_start,
                              interpret=backend.endswith("interpret"),
                              diff=backend.startswith("fused_diff"))
        from .world import World

        if (isinstance(scene, World) and scene.mesh is not None
                and not backend.startswith("fused_diff")):
            # Mesh-world fast forward path (roadmap 7): flat carries feed
            # BOTH kernels directly; gradient renders fall through to the
            # [N,3] integrator below.
            from .integrator_flat import trace_flat_world

            return trace_flat_world(scene, origins, directions, samp_keys,
                                    cfg.max_depth, cfg.t_min, nee=cfg.nee,
                                    rr_start=cfg.rr_start,
                                    interpret=backend.endswith("interpret"))
        backend = ("pallas_interpret" if backend.endswith("interpret")
                   else "pallas")
    return trace(scene, origins, directions, samp_keys, cfg.max_depth,
                 cfg.t_min, intersector=backend, nee=cfg.nee,
                 rr_start=cfg.rr_start)


def pixel_grid(cfg: RenderConfig, dtype=jnp.float32):
    """Flat per-pixel (i, j) viewport integer coordinates, image order.

    Returns (i [N], j [N], pixel_index [N]) with pixel_index = row*W + col,
    row 0 = top; j = height-1-row is the bottom-origin coordinate used by the
    reference's v computation.
    """
    h, w = cfg.height, cfg.width
    rows = jnp.arange(h)
    cols = jnp.arange(w)
    py, px = jnp.meshgrid(rows, cols, indexing="ij")  # [h,w]
    i = px.reshape(-1).astype(dtype)
    j = (h - 1 - py).reshape(-1).astype(dtype)
    pixel_index = (py * w + px).reshape(-1).astype(jnp.uint32)
    return i, j, pixel_index


def _sample_radiance(scene, camera, cfg: RenderConfig, pix_keys, i, j, sample_idx):
    """Trace one sample for every pixel; returns [N,3] linear radiance."""
    if cfg.edge_aware:
        from ..diff.edge import sample_radiance_edge_aware

        return sample_radiance_edge_aware(scene, camera, cfg, pix_keys,
                                          i, j, sample_idx)
    samp_keys = sampling.sample_keys(pix_keys, sample_idx)
    gen = sampling.stream_uniforms(samp_keys, sampling.STREAM_GEN,
                                  sampling.UNIFORMS_GEN)
    inv_w = 1.0 / max(cfg.width - 1, 1)
    inv_h = 1.0 / max(cfg.height - 1, 1)
    s = (i + gen[:, 0]) * inv_w
    t = (j + gen[:, 1]) * inv_h
    origins, directions = cam_mod.get_rays(camera, s, t, gen[:, 2], gen[:, 3])
    return _trace_dispatch(scene, origins, directions, samp_keys, cfg)


def _merged_batch_radiance(scene, camera, cfg: RenderConfig, pix_keys, i, j,
                           batch_idx, spb: int):
    """Trace spb samples of every pixel as ONE merged wavefront.

    Small images underfill the chip per launch (fixed per-bounce costs
    dominate below ~1M rays); concatenating the batch's samples into a
    single [spb*N] ray population amortizes them. Per-sample keys/uniforms
    are identical to the scan path, and the per-pixel sum runs in ascending
    sample order, so results match the one-sample-at-a-time path bitwise.
    """
    n = i.shape[0]
    rep = lambda x: jnp.concatenate([x] * spb, axis=0)
    sample_ids = batch_idx * spb + jnp.repeat(
        jnp.arange(spb, dtype=jnp.uint32), n)
    samp_keys = sampling.sample_keys(rep(pix_keys), sample_ids)
    gen = sampling.stream_uniforms(samp_keys, sampling.STREAM_GEN,
                                   sampling.UNIFORMS_GEN)
    inv_w = 1.0 / max(cfg.width - 1, 1)
    inv_h = 1.0 / max(cfg.height - 1, 1)
    s = (rep(i) + gen[:, 0]) * inv_w
    t = (rep(j) + gen[:, 1]) * inv_h
    origins, directions = cam_mod.get_rays(camera, s, t, gen[:, 2], gen[:, 3])
    rad = _trace_dispatch(scene, origins, directions, samp_keys, cfg)
    return jnp.sum(rad.reshape(spb, n, 3), axis=0)


@partial(jax.jit, static_argnames=("cfg",))
def render_linear(
    scene: SphereScene, camera, cfg: RenderConfig, key: jax.Array
) -> jnp.ndarray:
    """Sum of spp linear radiance samples, shape [H, W, 3] (row 0 = top).

    Divide by cfg.spp (or use tonemap.resolve) for the mean image. Keeping the
    un-normalized sum makes progressive accumulation and cross-chip psum exact.
    """
    i, j, pixel_index = pixel_grid(cfg)
    pix_keys = sampling.pixel_states(key, pixel_index, cfg.rng)

    spb = cfg.samples_per_batch
    num_batches = cfg.spp // spb

    # Rematerialize each sample-batch's trace: identical program for
    # forward-only renders, but under differentiation the backward
    # recomputes one batch at a time instead of saving EVERY
    # (chunk, batch, bounce) residual simultaneously — the chunked
    # backward materialized [chunks, batches, depth, chunk_rays] HLO
    # temps and OOMed HBM at 1080p multi-view training (config 5 at
    # spec; ~20 x 63 MB temps measured in the OOM report).
    @jax.checkpoint
    def _one_batch(scene, camera, pix_keys_c, i_c, j_c, batch_idx):
        if spb == 1:
            return _sample_radiance(scene, camera, cfg, pix_keys_c,
                                    i_c, j_c, batch_idx)
        return _merged_batch_radiance(scene, camera, cfg, pix_keys_c,
                                      i_c, j_c, batch_idx, spb)

    def render_chunk(pix_keys_c, i_c, j_c):
        def batch_step(accum, batch_idx):
            out = _one_batch(scene, camera, pix_keys_c, i_c, j_c, batch_idx)
            return accum + out, None

        accum = jnp.zeros((i_c.shape[0], 3), jnp.float32)
        accum, _ = jax.lax.scan(batch_step, accum, jnp.arange(num_batches))
        return accum

    n = cfg.num_pixels
    chunk = resolve_pixel_chunk(cfg)
    if chunk <= 0 or chunk >= n:
        accum = render_chunk(pix_keys, i, j)
    else:
        # Pad to a whole number of chunks; padding replays pixel 0 (its keys
        # are real, results are sliced off) so every chunk is full-size.
        n_pad = (-n) % chunk
        pad = lambda x: jnp.concatenate([x, x[:n_pad]]) if n_pad else x
        c = lambda x: pad(x).reshape((-1, chunk) + x.shape[1:])
        accum = jax.lax.map(
            lambda args: render_chunk(*args), (c(pix_keys), c(i), c(j))
        ).reshape(-1, 3)[:n]
    return accum.reshape(cfg.height, cfg.width, 3)


def render(scene: SphereScene, camera, cfg: RenderConfig, key: jax.Array):
    """Full batch render -> uint8 image [H, W, 3] (gamma-2, quantized)."""
    accum = render_linear(scene, camera, cfg, key)
    return tonemap.to_uint8(accum, cfg.spp, cfg.quantizer)


@partial(jax.jit, static_argnames=("cfg", "num_samples"))
def render_sample_batch(
    scene: SphereScene, camera, cfg: RenderConfig, key: jax.Array,
    start_sample: jnp.ndarray, num_samples: int,
) -> jnp.ndarray:
    """Linear radiance sum for samples [start, start+num) — the progressive
    building block (1-spp-per-frame accumulation of the GPU backends,
    GpuPathTracer.cpp:279-282, generalized to any batch size)."""
    i, j, pixel_index = pixel_grid(cfg)
    pix_keys = sampling.pixel_states(key, pixel_index, cfg.rng)

    def one_sample(acc, k):
        return acc + _sample_radiance(scene, camera, cfg, pix_keys, i, j,
                                      start_sample + k), None

    accum = jnp.zeros((cfg.num_pixels, 3), jnp.float32)
    accum, _ = jax.lax.scan(one_sample, accum, jnp.arange(num_samples))
    return accum.reshape(cfg.height, cfg.width, 3)
