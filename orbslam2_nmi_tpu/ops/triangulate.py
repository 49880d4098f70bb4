"""Batched two-view triangulation + acceptance gates.

Replaces Initializer::Triangulate (reference: src/Initializer.cc:749, per-point
DLT via cv::SVD) and the triangulation gates of LocalMapping::CreateNewMapPoints
(src/LocalMapping.cc:210: parallax, positive depth, reprojection chi2,
scale consistency) with one vmapped SVD and masked gate evaluation.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from orbslam2_nmi_tpu.geometry import se3


class TriangulationResult(NamedTuple):
    points_w: jnp.ndarray  # [N, 3] world points
    valid: jnp.ndarray  # [N] bool — passed all gates
    parallax_cos: jnp.ndarray  # [N]


def projection_matrix(K: jnp.ndarray, Tcw: jnp.ndarray) -> jnp.ndarray:
    """P = K [R|t] for world->pixel projection."""
    return jnp.matmul(K, Tcw[:3, :4], precision=jax.lax.Precision.HIGHEST)


def triangulate_dlt(P1: jnp.ndarray, P2: jnp.ndarray, uv1: jnp.ndarray, uv2: jnp.ndarray) -> jnp.ndarray:
    """Linear DLT triangulation, batched. uv*: [N, 2] pixels. Returns [N, 3].

    Same construction as Initializer::Triangulate (Initializer.cc:749):
    rows  u*P3 - P1row,  v*P3 - P2row  for both views; solution = last right
    singular vector.
    """
    def rows(P, uv):
        a = uv[..., 0:1] * P[2] - P[0]
        b = uv[..., 1:2] * P[2] - P[1]
        return jnp.stack([a, b], axis=-2)  # [N, 2, 4]

    A = jnp.concatenate([rows(P1, uv1), rows(P2, uv2)], axis=-2)  # [N, 4, 4]
    _, _, vt = jnp.linalg.svd(A)
    x = vt[..., 3, :]
    w = x[..., 3]
    w_safe = jnp.where(jnp.abs(w) > 1e-10, w, 1e-10)
    return x[..., :3] / w_safe[..., None]


def triangulate_and_gate(
    K: jnp.ndarray,
    Tcw1: jnp.ndarray,
    Tcw2: jnp.ndarray,
    uv1: jnp.ndarray,
    uv2: jnp.ndarray,
    inv_sigma2_1: jnp.ndarray,
    inv_sigma2_2: jnp.ndarray,
    valid: jnp.ndarray,
    min_parallax_cos: float = 0.9998,
    chi2_thresh: float = 5.991,
) -> TriangulationResult:
    """Triangulate matches between two posed views and apply the reference's
    acceptance gates (LocalMapping.cc:210 CreateNewMapPoints):
      * parallax: cos(ray angle) < min_parallax_cos (0.9998 ~ 1.15 deg)
      * positive depth in both cameras
      * reprojection chi2 <= 5.991 / sigma2 in both views
    """
    P1 = projection_matrix(K, Tcw1)
    P2 = projection_matrix(K, Tcw2)
    pts_w = triangulate_dlt(P1, P2, uv1, uv2)

    c1 = se3.se3_apply(se3.se3_inverse(Tcw1), jnp.zeros(3))  # camera centers (world)
    c2 = se3.se3_apply(se3.se3_inverse(Tcw2), jnp.zeros(3))
    r1 = pts_w - c1
    r2 = pts_w - c2
    cos_par = jnp.sum(r1 * r2, axis=-1) / (
        jnp.linalg.norm(r1, axis=-1) * jnp.linalg.norm(r2, axis=-1) + 1e-12
    )

    def reproj_ok(Tcw, uv, inv_s2):
        pc = se3.se3_apply(Tcw, pts_w)
        z = pc[..., 2]
        u = K[0, 0] * pc[..., 0] / jnp.where(z > 1e-9, z, 1e-9) + K[0, 2]
        v = K[1, 1] * pc[..., 1] / jnp.where(z > 1e-9, z, 1e-9) + K[1, 2]
        err2 = (u - uv[..., 0]) ** 2 + (v - uv[..., 1]) ** 2
        return (z > 0) & (err2 * inv_s2 <= chi2_thresh)

    ok = (
        valid
        & (cos_par < min_parallax_cos)
        & (cos_par > 0)
        & reproj_ok(Tcw1, uv1, inv_sigma2_1)
        & reproj_ok(Tcw2, uv2, inv_sigma2_2)
        & jnp.isfinite(pts_w).all(axis=-1)
    )
    return TriangulationResult(points_w=pts_w, valid=ok, parallax_cos=cos_par)


@jax.jit
def triangulate_and_gate_batch(
    K: jnp.ndarray,
    Tcw1: jnp.ndarray,  # [4, 4] the new keyframe (shared)
    Tcw2_b: jnp.ndarray,  # [N, 4, 4] neighbor poses
    uv1_b: jnp.ndarray,  # [N, NB, 2]
    uv2_b: jnp.ndarray,  # [N, NB, 2]
    is2_1_b: jnp.ndarray,  # [N, NB]
    is2_2_b: jnp.ndarray,  # [N, NB]
    valid_b: jnp.ndarray,  # [N, NB]
) -> TriangulationResult:
    """All neighbor pairs of CreateNewMapPoints triangulated + gated in ONE
    dispatch (vmap over the pair axis; see matching.match_epipolar_batch for
    why the per-pair host loop is a 10x mapper-latency problem on remote
    devices). Fields come back with a leading [N] pair axis."""

    def one(Tcw2, uv1, uv2, s1, s2, v):
        return triangulate_and_gate(K, Tcw1, Tcw2, uv1, uv2, s1, s2, v)

    return jax.vmap(one)(Tcw2_b, uv1_b, uv2_b, is2_1_b, is2_2_b, valid_b)
