"""Persistent XLA compilation cache.

First compile of each jitted function via the tunneled TPU backend costs
25-40 s; the on-disk cache brings warm-process start to ~1 s per function.
Enabled by the demo/bench/tools entry points (library import stays
side-effect free)."""
from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "deepfactors_tpu", "xla"
)


def enable_compilation_cache(cache_dir: str = None) -> str:
    """Point JAX's persistent compilation cache at ``cache_dir`` (created if
    missing). Returns the directory used. Safe to call repeatedly."""
    import jax

    d = cache_dir or os.environ.get("DF_XLA_CACHE_DIR", _DEFAULT_DIR)
    os.makedirs(d, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", d)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    return d
