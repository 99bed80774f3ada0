"""Profiling / observability hooks.

The reference's only instrumentation is QElapsedTimer + atomic counters
formatted into statsText (SURVEY.md §5). TPU equivalents:

  - trace(): jax.profiler context writing an XPlane trace viewable in
    TensorBoard / Perfetto (kernel timings, HBM traffic, ICI collectives).
  - device_memory_stats(): live HBM usage per device.
  - annotate(): TraceAnnotation for custom spans inside the host loop.
"""

from __future__ import annotations

import contextlib
from typing import Iterator

import jax


@contextlib.contextmanager
def trace(logdir: str = "/tmp/qtrt_trace") -> Iterator[None]:
    """Capture a device trace for everything inside the context.

    View with: tensorboard --logdir <logdir>  (Profile plugin), or load the
    .xplane.pb in Perfetto.
    """
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named span inside a trace() capture (host-side annotation)."""
    return jax.profiler.TraceAnnotation(name)


def device_memory_stats() -> list[dict]:
    """Per-device memory stats (bytes in use / limit) where supported."""
    out = []
    for dev in jax.devices():
        stats = {}
        try:
            stats = dict(dev.memory_stats() or {})
        except Exception:
            pass
        out.append({"device": str(dev), **stats})
    return out
