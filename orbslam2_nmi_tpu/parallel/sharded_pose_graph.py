"""Edge-sharded essential-graph Sim(3) optimization over a device mesh.

The post-loop pose graph (solvers/pose_graph.py; reference
Optimizer::OptimizeEssentialGraph, src/Optimizer.cc:798) has one natural
parallel axis: the EDGES (spanning tree + loop + strong covisibility). Normal
equations are additive over edges, so each chip computes its edge shard's
7x7 GN blocks and ONLY those O(E) blocks ride the interconnect
(all_gather, ~161 floats/edge): an essential graph touches ~2E+V of the
V^2 block pairs (1-2% at loop scale), so exchanging a psum-reduced dense
[7V, 7V] H — the previous design — moved ~50-70x more bytes per iteration
than the information content. The dense scatter + Cholesky solve
(V = keyframes, a few hundred) does not parallelize usefully, so it runs on
ONE chip and the updated poses are broadcast with a psum — same critical path
as a replicated solve, but no duplicated FLOPs (SURVEY.md §2.4 P7 pattern:
block-row assembly + root-solved reduced system).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P

from orbslam2_nmi_tpu.solvers import pose_graph as pg


def _pad_edges(prob: pg.PoseGraphProblem, multiple: int) -> pg.PoseGraphProblem:
    E = prob.edge_i.shape[0]
    pad = (-E) % multiple
    if pad == 0:
        return prob
    eye = jnp.tile(jnp.eye(4), (pad, 1, 1))
    return prob._replace(
        edge_i=jnp.concatenate([prob.edge_i, jnp.zeros(pad, prob.edge_i.dtype)]),
        edge_j=jnp.concatenate([prob.edge_j, jnp.zeros(pad, prob.edge_j.dtype)]),
        edge_Sji=jnp.concatenate([prob.edge_Sji, eye]),
        edge_valid=jnp.concatenate([prob.edge_valid, jnp.zeros(pad, bool)]),
    )


def sharded_optimize_pose_graph(
    mesh, prob: pg.PoseGraphProblem, iters: int = 20, lam: float = 1e-16
) -> jnp.ndarray:
    """Same result as pose_graph.optimize_pose_graph, edges sharded over the
    mesh (bitwise-equal H/b up to psum summation order)."""
    D = mesh.devices.size
    axis = mesh.axis_names[0]
    prob = _pad_edges(prob, D)
    V = prob.Scw.shape[0]

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P(axis), P(axis), P(), P(), P()),
        out_specs=P(),
        check_vma=False,
    )
    def gn_step_sharded(Scw, ei, ej, Sji, ev, ei_full, ej_full, free):
        HII, HJJ, HIJ, bI, bJ = pg.edge_blocks(Scw, ei, ej, Sji, ev)
        E_loc = ei.shape[0]
        flat = jnp.concatenate(
            [HII.reshape(E_loc, 49), HJJ.reshape(E_loc, 49),
             HIJ.reshape(E_loc, 49), bI, bJ], axis=-1,
        )  # [E_loc, 161]
        # tiled all_gather reassembles shards in device order = the original
        # padded edge order, so the replicated ei_full/ej_full index it
        flat_all = jax.lax.all_gather(flat, axis, tiled=True)  # [E, 161]
        # scatter + solve on chip 0 only, broadcast the updated poses (psum
        # of a zero-masked value = broadcast); a replicated solve would cost
        # n_devices x the FLOPs for the same wall time
        on_root = jax.lax.axis_index(axis) == 0

        def solve_root():
            H, b = pg.scatter_blocks(
                V, ei_full, ej_full,
                flat_all[:, :49].reshape(-1, 7, 7),
                flat_all[:, 49:98].reshape(-1, 7, 7),
                flat_all[:, 98:147].reshape(-1, 7, 7),
                flat_all[:, 147:154], flat_all[:, 154:161],
            )
            return pg.solve_and_update(Scw, H, b, free, lam)

        S_new = jax.lax.cond(on_root, solve_root, lambda: jnp.zeros_like(Scw))
        return jax.lax.psum(S_new, axis)

    @functools.partial(jax.jit, static_argnames=())
    def run(Scw, ei, ej, Sji, ev, free):
        def gn_step(S, _):
            return gn_step_sharded(S, ei, ej, Sji, ev, ei, ej, free), None

        S, _ = jax.lax.scan(gn_step, Scw, None, length=iters)
        return S

    free = prob.valid & (~prob.fixed)
    return run(prob.Scw, prob.edge_i, prob.edge_j, prob.edge_Sji, prob.edge_valid, free)
