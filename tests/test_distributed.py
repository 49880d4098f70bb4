"""Real multi-process jax.distributed test (SURVEY.md §2.4 P7 / §4).

Two OS processes, each exposing 4 virtual CPU devices, join through
`jax.distributed.initialize` into one 8-device pod (the standard way to fake
a multi-host pod without TPUs) and run the edge-sharded essential-graph
optimization over the GLOBAL mesh. Each process checks the distributed result
against its own single-device solve — proving the cross-host collective path
computes the same answer the per-chip tests validate.
"""

import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import os, sys
import numpy as np

pid = int(sys.argv[1]); port = sys.argv[2]
from orbslam2_nmi_tpu.parallel import distributed
jax = distributed.init_runtime(
    coordinator_address=f"127.0.0.1:{port}", num_processes=2, process_id=pid,
    platform="cpu", local_device_count=4,
)
import jax.numpy as jnp
assert len(jax.devices()) == 8, jax.devices()
assert jax.process_count() == 2

from orbslam2_nmi_tpu.geometry import se3
from orbslam2_nmi_tpu.parallel import sharded_pose_graph
from orbslam2_nmi_tpu.solvers import pose_graph

V = 10
gt = [np.asarray(se3.se3_exp(jnp.asarray([0.5 * i, 0, 0, 0, 0, 0], jnp.float32)))
      for i in range(V)]
est = [gt[0]]
for i in range(1, V):
    rel = gt[i] @ np.linalg.inv(gt[i - 1])
    bias = np.asarray(se3.se3_exp(jnp.asarray([0.02, 0.01, 0, 0, 0.004, 0], jnp.float32)))
    est.append(bias @ rel @ est[i - 1])
est = np.stack(est)
ei = list(range(V - 1)) + [0]
ej = list(range(1, V)) + [V - 1]
meas = [est[j] @ np.linalg.inv(est[i]) for i, j in zip(ei[:-1], ej[:-1])]
meas.append(gt[V - 1] @ np.linalg.inv(gt[0]))
prob = pose_graph.PoseGraphProblem(
    Scw=jnp.asarray(est),
    fixed=jnp.asarray(np.arange(V) == 0),
    valid=jnp.ones(V, bool),
    edge_i=jnp.asarray(ei, jnp.int32),
    edge_j=jnp.asarray(ej, jnp.int32),
    edge_Sji=jnp.asarray(np.stack(meas).astype(np.float32)),
    edge_valid=jnp.ones(len(meas), bool),
)
mesh = distributed.global_mesh()
assert mesh.devices.size == 8
out = sharded_pose_graph.sharded_optimize_pose_graph(mesh, prob, iters=10)
assert out.sharding.is_fully_replicated
out_np = np.asarray(out)

# single-process reference solve on this host's local devices only
single = np.asarray(pose_graph.optimize_pose_graph(prob, iters=10))
np.testing.assert_allclose(out_np, single, atol=1e-4)
print(f"proc {pid}: distributed pose graph ok over {jax.process_count()} processes")
"""


def test_two_process_pod_pose_graph(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # workers set their own device count
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(i), str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            cwd=repo_root,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=550)
        outs.append(out.decode())
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out}"
        assert "distributed pose graph ok over 2 processes" in out, out
