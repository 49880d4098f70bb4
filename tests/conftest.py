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
