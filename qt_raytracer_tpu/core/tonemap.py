"""Tone mapping and quantization.

Both reference quantizers are kept (SURVEY.md §7 item 8):
  - "cpu": gamma-2 then int(256 * clamp(c, 0, 0.999))
           (src/app/RayTracerFboItem.cpp:115-127) — the canonical one.
  - "gpu": gamma-2 then uint(c * 255)
           (GpuPathTracer.cpp embedded shader / CudaPathTracerKernel.cu).
"""

from __future__ import annotations

import jax.numpy as jnp


def resolve(accum_linear: jnp.ndarray, spp) -> jnp.ndarray:
    """Mean + gamma-2 (sqrt) of a summed linear radiance buffer."""
    scale = 1.0 / spp
    return jnp.sqrt(jnp.maximum(accum_linear * scale, 0.0))


def quantize(gamma_img: jnp.ndarray, quantizer: str = "cpu") -> jnp.ndarray:
    """Gamma-space [*,3] floats -> uint8."""
    if quantizer == "cpu":
        q = jnp.floor(256.0 * jnp.clip(gamma_img, 0.0, 0.999))
    elif quantizer == "gpu":
        q = jnp.floor(jnp.clip(gamma_img, 0.0, 1.0) * 255.0)
    else:
        raise ValueError(f"unknown quantizer {quantizer!r}")
    return q.astype(jnp.uint8)


def to_uint8(accum_linear: jnp.ndarray, spp, quantizer: str = "cpu") -> jnp.ndarray:
    return quantize(resolve(accum_linear, spp), quantizer)
