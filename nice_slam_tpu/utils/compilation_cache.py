"""Persistent XLA compilation cache setup.

Two problems on this TPU stack make a disk cache essential rather than a
nicety (both measured, see ops/trilinear.py and bench.py):
  * compiles go through a remote service whose latency varies from seconds
    to minutes;
  * code quality is nondeterministic across compiles — the same tracking
    program has come back 5x slower depending on compile luck.

With the cache enabled, a program compiles once; every later process reuses
the exact cached binary, making both startup time and runtime performance
deterministic.  bench.py additionally retries compilation until a
fast-enough binary lands in the cache (see its `--retune` logic).
"""

from __future__ import annotations

import os


def enable(cache_dir: str | None = None) -> str:
    import jax

    if cache_dir is None:
        cache_dir = os.environ.get(
            'NSTPU_JAX_CACHE',
            os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))), '.jax_cache'))
    # one subdirectory per backend: CPU AOT artifacts embed host machine
    # features and must not be shared with (or clobbered by) artifacts
    # produced by the remote TPU compile service on a different machine
    try:
        platform = jax.default_backend()
    except Exception:
        platform = 'unknown'
    if platform == 'tpu' and not os.environ.get('NSTPU_PERSIST_TPU_CACHE'):
        # MEASURED (round 2): on the remote-compile TPU stack, LOADING a
        # cached executable is pathological — a persistent-cache HIT took
        # 490 s (then hung entirely on a later run) vs 62 s for the cold
        # compile of the same program, and the hang surfaces as a spurious
        # 'TPU device error / UNAVAILABLE'.  Until executable
        # deserialization works on this stack, the persistent cache is
        # disabled for the TPU backend (in-process jit caching still
        # applies); set NSTPU_PERSIST_TPU_CACHE=1 to force it back on.
        return ''
    cache_dir = os.path.join(cache_dir, platform)
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update('jax_compilation_cache_dir', cache_dir)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)
    jax.config.update('jax_persistent_cache_min_entry_size_bytes', 0)
    return cache_dir


def clear(cache_dir: str | None = None) -> None:
    import shutil
    if cache_dir is None:
        cache_dir = enable()
    if not cache_dir:
        # enable() reported the persistent cache is disabled on this
        # backend (TPU remote-compile path) — nothing to clear.
        return
    shutil.rmtree(cache_dir, ignore_errors=True)
    os.makedirs(cache_dir, exist_ok=True)
