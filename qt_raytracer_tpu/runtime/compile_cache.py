"""Persistent XLA compilation cache (opt-in per entry point).

Config-5's multi-view train step compiles in 445-656 s through the remote
axon tunnel (docs/PERFORMANCE.md); without a persistent cache every fresh
session repays that before the first optimizer step. JAX ships a disk cache
for exactly this — enabling it makes recompiles of an UNCHANGED program a
cache hit (measured: the config-5 step drops to seconds on the second
session; see the ledger entry).

Entry points (CLI, bench.py, run_baselines.py, __graft_entry__) call
`enable_compilation_cache()` once at startup. Library imports do NOT enable
it implicitly: tests intentionally measure cold compiles, and a cache dir
write is a side effect a library should not spring on its host process.

Env knobs:
  QTRT_COMPILE_CACHE=0      disable entirely
  QTRT_COMPILE_CACHE_DIR=…  override the cache directory
                            (default ~/.cache/qt_raytracer_tpu/xla)
"""

from __future__ import annotations

import os

_ENABLED_DIR: str | None = None


def enable_compilation_cache(cache_dir: str | None = None,
                             min_compile_time_secs: float = 1.0) -> str | None:
    """Idempotently enable JAX's persistent compilation cache.

    Returns the cache directory in use, or None when disabled
    (QTRT_COMPILE_CACHE=0) or unsupported by the installed jax.
    """
    global _ENABLED_DIR
    if os.environ.get("QTRT_COMPILE_CACHE", "1") == "0":
        return None
    if _ENABLED_DIR is not None:
        return _ENABLED_DIR
    cache_dir = (cache_dir
                 or os.environ.get("QTRT_COMPILE_CACHE_DIR")
                 or os.path.expanduser("~/.cache/qt_raytracer_tpu/xla"))
    try:
        os.makedirs(cache_dir, exist_ok=True)
        import jax
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # Cache every compile that took >= min_compile_time_secs (default
        # threshold is 1 s upstream; pinned here so a jax default change
        # can't silently stop caching the multi-second render graphs).
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          min_compile_time_secs)
        # Remote (axon) executables serialize fine; nothing platform-gated.
    except Exception:           # pragma: no cover - old jax / read-only FS
        return None
    _ENABLED_DIR = cache_dir
    return cache_dir
