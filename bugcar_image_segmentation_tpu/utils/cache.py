"""Persistent XLA compile-cache setup, isolated per backend.

One shared ``.jax_cache`` directory caused cross-contamination: CPU runs
that followed TPU runs (or ran on a different host) hit AOT feature-
mismatch errors ("could lead to SIGILL").  Worse, XLA's CPU AOT loader
compares the compile-time LLVM feature string — which contains tuning
pseudo-features like ``+prefer-no-scatter`` that are never reported as
host features — against the runtime-detected host set, so every CPU cache
*hit* logs that error even on the same machine.  CPU compilation of our
programs takes seconds, so the cache is enabled for accelerator backends
only (where first compilation through the TPU tunnel costs minutes, see
PERF.md), each under its own subdirectory.

No reference analogue — the reference's TF1 graphs carry no compile cache.
"""

from __future__ import annotations

import os
import time


def enable_compile_cache(root: str | None = None) -> str | None:
    """Point JAX's persistent compilation cache at a per-backend subdir.

    ``root`` defaults to ``<repo>/.jax_cache`` (two levels above this
    package).  Initializes the JAX backend (with retries for the tunneled
    TPU plugin's transient registration failures) to learn which backend
    is active.  Returns the cache directory used, or None on CPU (no
    persistent cache — see module docstring).
    """
    import jax

    for attempt in range(5):
        try:
            backend = jax.default_backend()
            break
        except RuntimeError:
            if attempt == 4:
                raise
            time.sleep(5.0)

    if backend == "cpu":
        return None
    if root is None:
        root = os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))), ".jax_cache")
    cache = os.path.join(root, backend)
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return cache
