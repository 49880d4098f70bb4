"""Multi-host runtime: jax.distributed initialization + the global mesh.

The reference is a single-process realtime system with no distributed backend
of any kind (SURVEY.md §2.4 P7) — this module is the scale-out entry the TPU
build adds. Every host calls `init_runtime()` BEFORE any JAX computation:

  * on a real TPU pod slice, `jax.distributed.initialize()` auto-detects the
    coordinator and process count from the TPU environment;
  * anywhere else (including the CPU-faked pod used in CI), the coordinator
    address / process count / process id come from arguments or the standard
    env vars (JAX_COORDINATOR_ADDRESS, JAX_NUM_PROCESSES, JAX_PROCESS_ID).

After initialization `jax.devices()` spans the whole pod and the meshes from
`global_mesh()` carry ICI/DCN collectives exactly as the single-process
8-virtual-device tests exercise them (same shard_map code paths:
parallel/sharded_nmi.py, sharded_ba.py, sharded_pose_graph.py).
"""

from __future__ import annotations

import logging
import os
from typing import Optional


def init_runtime(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    platform: Optional[str] = None,
    local_device_count: Optional[int] = None,
):
    """Initialize the jax.distributed runtime for this process.

    Must be called before the first JAX computation. `local_device_count`
    forces N virtual CPU devices per process (CI pods without TPUs); it must
    be set before the XLA backend initializes, so pass it here rather than
    editing XLA_FLAGS afterwards. Returns the initialized jax module.
    """
    if local_device_count is not None:
        flags = os.environ.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count={local_device_count}"
            ).strip()
    import jax

    if platform is not None:
        # the image's sitecustomize may force its own platform list; an
        # explicit argument wins (tests force "cpu")
        jax.config.update("jax_platforms", platform)

    coordinator_address = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])

    if coordinator_address is None and num_processes is None and process_id is None:
        # single-process fallback (or TPU-pod auto-detection when available)
        try:
            jax.distributed.initialize()
        except Exception as e:  # plain single-host run: nothing to initialize
            logging.getLogger(__name__).info(
                "jax.distributed auto-initialize unavailable (%s); "
                "continuing single-process", e,
            )
        return jax

    # explicit pod configuration: all three must be given together — a
    # partial config (e.g. JAX_COORDINATOR_ADDRESS without JAX_NUM_PROCESSES)
    # would otherwise fail deep inside jax with an obscure error, or worse,
    # silently run as a mis-configured single host
    missing = [
        name
        for name, v in (
            ("coordinator_address/JAX_COORDINATOR_ADDRESS", coordinator_address),
            ("num_processes/JAX_NUM_PROCESSES", num_processes),
            ("process_id/JAX_PROCESS_ID", process_id),
        )
        if v is None
    ]
    if missing:
        raise ValueError(
            f"incomplete jax.distributed configuration: missing {missing} "
            "(coordinator address, process count and process id must be "
            "provided together)"
        )

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return jax


def global_mesh(axis: str = "pose"):
    """1-D mesh over every device in the (possibly multi-host) pod."""
    import numpy as np
    import jax
    from jax.sharding import Mesh

    return Mesh(np.array(jax.devices()), (axis,))


def replicate(x):
    """Host-local array -> globally replicated jax.Array on the global mesh.
    Every process must pass the same value."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    return jax.device_put(x, NamedSharding(global_mesh(), P()))
