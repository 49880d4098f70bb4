"""Test configuration: run everything on a virtual 8-device CPU mesh.

This is the standard way to exercise multi-chip sharding logic without TPU
hardware (SURVEY.md §4): XLA's host platform is forced to expose 8 devices, so
`jax.sharding.Mesh` tests cover the same pjit/shard_map paths that run on a pod.

Note: the image's sitecustomize registers a remote `axon` TPU backend in every
interpreter and forces `jax_platforms="axon,cpu"`; tests must run locally, so we
re-force the platform to cpu *after* importing jax (env vars alone are
overridden by that registration).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

# Persistent compilation cache: the suite is dominated by XLA compile time
# (many static-shape specializations), and compiled executables are keyed by
# HLO hash, so re-runs skip straight to execution.
_cache_dir = os.path.join(os.path.dirname(__file__), os.pardir, ".jax_cache")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache_dir))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
