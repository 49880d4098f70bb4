"""Device-mesh construction helpers.

The reference is a single-process realtime system with zero distributed
machinery (SURVEY.md §2.4 P7); the TPU build adds scale-out along the three
axes that exist in this workload: NMI pose-grid candidates, BA observations,
and frame pyramid tiles. All of them map onto a 1-D or 2-D
`jax.sharding.Mesh` with XLA collectives over ICI.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh


POSE_AXIS = "pose"  # NMI translation-candidate sharding
OBS_AXIS = "obs"  # BA observation sharding


def make_mesh(n_devices: int | None = None, axis: str = POSE_AXIS) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (axis,))


def make_mesh_2d(n_pose: int, n_obs: int) -> Mesh:
    devs = np.array(jax.devices()[: n_pose * n_obs]).reshape(n_pose, n_obs)
    return Mesh(devs, (POSE_AXIS, OBS_AXIS))
