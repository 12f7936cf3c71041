"""Persistent XLA compile cache for user-facing surfaces.

Cold tower/prefill compiles are minutes on a weak host (PERF.md: ~7 min for a
7B tower pipeline on this 1-core machine); a fresh benchmark run recompiles
one program per (frame-bucket x generate-key) combination
(eval/runner.py bucketed jits).  The reference has no analog — torch eager
pays no compile, JAX must amortize it.  Every CLI entry point
(eval harness, demo, serve, train) calls `enable_compile_cache()` so the
second process-level invocation compiles ~nothing.

Environment knobs:
* TDC_COMPILE_CACHE=<dir>  — cache location (default ~/.cache/tdc_video_tpu/
  xla-<platform>; per-platform keying avoids the cpu_aot_loader SIGILL of
  machine-feature-keyed CPU artifacts travelling across hosts, see
  __graft_entry__.py).
* TDC_DISABLE_JAX_CACHE=1  — turn it off entirely.
"""

from __future__ import annotations

import os


def enable_compile_cache(cache_dir: str | None = None, min_compile_secs: int = 2) -> str | None:
    """Point jax at a persistent on-disk compile cache.  Returns the dir
    in use, or None when disabled.  Safe to call more than once."""
    if os.environ.get("TDC_DISABLE_JAX_CACHE"):
        return None
    import jax

    if cache_dir is None:
        cache_dir = os.environ.get("TDC_COMPILE_CACHE")
    if cache_dir is None:
        # NOT jax.default_backend(): that would initialize the backend, which
        # must stay legal to call before jax.distributed.initialize().
        platform = os.environ.get("JAX_PLATFORMS", "").split(",")[0] or "default"
        cache_dir = os.path.join(
            os.path.expanduser("~"), ".cache", "tdc_video_tpu", f"xla-{platform}"
        )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", min_compile_secs
        )
    except Exception:
        return None
    return cache_dir
