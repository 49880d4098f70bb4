"""Persistent XLA compilation cache for CLI tools and benchmarks.

On the tunneled TPU backend a single program compile costs tens of seconds to
minutes of remote-compile round-trip; the full replay pipeline compiles dozens
of bucket-shaped specializations. Compiled executables are keyed by HLO hash
and deserialize in milliseconds (measured on this backend: 366 s cold compile
-> 0.4 s warm), so every entry point enables the same on-disk cache the test
suite uses (tests/conftest.py). Cache location override:
ORBSLAM2_NMI_TPU_JAX_CACHE.
"""

from __future__ import annotations

import os

_DEFAULT = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), ".jax_cache")


def enable_persistent_cache(cache_dir: str | None = None) -> str:
    import jax

    d = cache_dir or os.environ.get("ORBSLAM2_NMI_TPU_JAX_CACHE", _DEFAULT)
    os.makedirs(d, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", d)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return d
