"""Fused device-resident tracking: the whole per-frame hot path in ONE jit.

The classic Tracker (slam/tracking.py) mirrors the reference's host-
orchestrated per-frame flow (Tracking::Track, src/Tracking.cc:356-692):
extract -> motion-model match -> pose GN -> local-map match -> pose GN, with
a device->host synchronization after every stage. That is the right shape for
a GPU in the same chassis; on TPU — where the host link is a network hop and
every fetch costs a round trip — it caps wall-clock fps far below the chip's
throughput.

This module is the TPU-first redesign of that hot path:

  * `make_fused_step` compiles extraction + undistortion + motion-model
    matching + pose-only GN + local-map matching + final pose GN into a
    SINGLE XLA program. Its carry (last pose, velocity, last frame's
    features and bound landmark positions) lives on DEVICE across frames, so
    the pose chain never bounces through the host.
  * All results the host needs for map bookkeeping (features, bindings,
    inlier flags, counters) come back as ONE packed f32 buffer = one fetch
    per frame.
  * `PipelinedFrontend` drives it with a lag-1 software pipeline: frame i's
    device step runs while the host processes frame i-1's results (keyframe
    decision, map updates, trajectory rows). Keyframe creation, NMI
    relocalization, local mapping and loop closing stay on the classic path
    (they are per-keyframe, not per-frame); after any of them mutates the
    map, the carry is re-anchored from the host exactly like
    Tracking::UpdateLastFrame (Tracking.cc:1020).

Parity deviations (all bounded-staleness, in the spirit of the reference's
own asynchronous threads): the local-map candidate set and keyframe decision
for frame i are computed from frame i-1's processed results, and map
corrections reach the device chain one dispatch later.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from orbslam2_nmi_tpu.config import SystemConfig
from orbslam2_nmi_tpu.geometry import se3
from orbslam2_nmi_tpu.ops import matching
from orbslam2_nmi_tpu.ops.orb import extract_orb
from orbslam2_nmi_tpu.slam.frame import FrameData
from orbslam2_nmi_tpu.solvers import pose_gn


class TrackCarry(NamedTuple):
    """Device-resident inter-frame state (the `mLastFrame` + velocity of
    Tracking.cc, never fetched on the critical path)."""

    Tcw: jnp.ndarray  # [4, 4] last frame's pose
    velocity: jnp.ndarray  # [4, 4] Tcw_cur @ inv(Tcw_last)
    xy: jnp.ndarray  # [N, 2] last frame's undistorted keypoints
    octave: jnp.ndarray  # [N] int32
    angle: jnp.ndarray  # [N] f32
    desc: jnp.ndarray  # [N, 8] uint32
    pts: jnp.ndarray  # [N, 3] world position of the landmark bound to each kp
    bound: jnp.ndarray  # [N] bool — kp has an (inlier) landmark


class StepOutputs(NamedTuple):
    carry: TrackCarry
    packed: jnp.ndarray  # [P] f32 — see pack/unpack below


def _scatter_rows(idx_src_to_feat, values, n_feat, fill=0.0):
    """values [M, ...] scattered to feature rows; idx -1 dropped."""
    safe = jnp.where(idx_src_to_feat >= 0, idx_src_to_feat, n_feat)
    out_shape = (n_feat + 1,) + values.shape[1:]
    base = jnp.full(out_shape, fill, values.dtype)
    return base.at[safe].set(values, mode="drop")[:n_feat]


def make_fused_step(cfg: SystemConfig, n_cand: int = 2048):
    """Build the jitted per-frame step.

    step(gray_u8 [H, W], carry, cand_*) -> StepOutputs
      cand_pts [C, 3], cand_desc [C, 8] u32, cand_min_d/cand_max_d [C],
      cand_normal [C, 3], cand_valid [C] bool — the local-map candidate set
      (host-provided, padded to C = n_cand).
    """
    K = jnp.asarray(cfg.camera.K)
    fx, fy, cx, cy = cfg.camera.K[0, 0], cfg.camera.K[1, 1], cfg.camera.K[0, 2], cfg.camera.K[1, 2]
    W, H = cfg.camera.width, cfg.camera.height
    sf = float(cfg.orb.scale_factor)
    n_levels = cfg.orb.n_levels
    inv_sigma2_tab = jnp.asarray((1.0 / (sf ** np.arange(n_levels)) ** 2).astype(np.float32))
    t = cfg.tracking

    def project(Tcw, pts):
        # HIGHEST precision: on TPU a default-precision matmul runs bf16 —
        # fine for ML, fatal for a pose chain (the classic front-end does
        # these products in host numpy; the fused chain must match)
        pc = jnp.matmul(pts, Tcw[:3, :3].T, precision=jax.lax.Precision.HIGHEST) + Tcw[:3, 3]
        z = jnp.where(jnp.abs(pc[:, 2]) > 1e-9, pc[:, 2], 1e-9)
        return jnp.stack([fx * pc[:, 0] / z + cx, fy * pc[:, 1] / z + cy], -1), pc[:, 2]

    @jax.jit
    def step(gray_u8, carry: TrackCarry, cand_pts, cand_desc, cand_min_d,
             cand_max_d, cand_normal, cand_valid) -> StepOutputs:
        feats = extract_orb(gray_u8, cfg.orb)
        N = feats.xy.shape[0]
        f_inv_sigma2 = inv_sigma2_tab[feats.octave]

        # ---- motion model: project last frame's landmarks at the predicted
        # pose, windowed search th=15 (Tracking.cc:1083, :1124)
        Tp = se3.se3_compose(carry.velocity, carry.Tcw)
        proj, _ = project(Tp, carry.pts)
        radius = 15.0 * sf ** carry.octave.astype(jnp.float32)
        sm = matching.window_mask(
            proj, feats.xy, jnp.where(carry.bound, radius, -1.0),
            carry.octave, feats.octave, level_window=1,
        )
        idx1, _ = matching.match_descriptors(
            carry.desc, carry.bound, feats.desc, feats.valid,
            spatial_mask=sm, max_dist=matching.TH_HIGH, apply_ratio=False,
            angle_a=carry.angle, angle_b=feats.angle, check_rotation=True,
        )  # [N] -> feature row or -1
        n_matches1 = jnp.sum(idx1 >= 0)

        pts1 = _scatter_rows(idx1, carry.pts, N)  # [N, 3] per-feature landmark
        bound1 = _scatter_rows(idx1, jnp.ones(N, bool), N, fill=False)
        src_prev = _scatter_rows(idx1, jnp.arange(N, dtype=jnp.int32), N, fill=-1)

        r1 = pose_gn.pose_optimization_k(
            K, Tp, pts1, feats.xy, f_inv_sigma2, bound1 & feats.valid,
            rounds=t.pose_opt_rounds, iters=t.pose_opt_iters,
        )

        # ---- local map (TrackLocalMap, Tracking.cc:1172): project host-
        # provided candidates at the refined pose, frustum + distance +
        # viewing-angle gates (Frame::isInFrustum), scale-predicted radius
        cproj, cz = project(r1.Tcw, cand_pts)
        cam_c = -jnp.matmul(
            r1.Tcw[:3, :3].T, r1.Tcw[:3, 3], precision=jax.lax.Precision.HIGHEST
        )
        dvec = cand_pts - cam_c
        dist = jnp.linalg.norm(dvec, axis=-1)
        cosv = jnp.sum(dvec / jnp.maximum(dist[:, None], 1e-9) * cand_normal, -1)
        in_view = (
            cand_valid
            & (cz > 0)
            & (cproj[:, 0] >= 0) & (cproj[:, 0] < W)
            & (cproj[:, 1] >= 0) & (cproj[:, 1] < H)
            & (dist >= 0.8 * cand_min_d) & (dist <= 1.2 * cand_max_d)
            & (cosv > 0.5)
        )
        ratio = jnp.clip(cand_max_d / jnp.maximum(dist, 1e-9), 1.0, sf ** n_levels)
        pred = jnp.clip(
            jnp.ceil(jnp.log(ratio) / np.log(sf)).astype(jnp.int32), 0, n_levels - 1
        )
        crad = 4.0 * sf ** pred.astype(jnp.float32)
        csm = matching.window_mask(
            cproj, feats.xy, jnp.where(in_view, crad, -1.0), pred, feats.octave,
            level_window=1,
        )
        free = feats.valid & (~bound1)
        idx2, _ = matching.match_descriptors(
            cand_desc, in_view, feats.desc, free,
            spatial_mask=csm, max_dist=matching.TH_HIGH, nn_ratio=0.8,
        )  # [C] -> feature row or -1

        pts2 = _scatter_rows(idx2, cand_pts, N)
        bound2 = _scatter_rows(idx2, jnp.ones(n_cand, bool), N, fill=False)
        src_cand = _scatter_rows(idx2, jnp.arange(n_cand, dtype=jnp.int32), N, fill=-1)

        all_bound = bound1 | bound2
        all_pts = jnp.where(bound1[:, None], pts1, pts2)
        r2 = pose_gn.pose_optimization_k(
            K, r1.Tcw, all_pts, feats.xy, f_inv_sigma2, all_bound & feats.valid,
            rounds=t.pose_opt_rounds, iters=t.pose_opt_iters,
        )
        inlier = r2.inliers & all_bound

        velocity = r2.Tcw @ jnp.linalg.inv(carry.Tcw)
        new_carry = TrackCarry(
            Tcw=r2.Tcw, velocity=velocity, xy=feats.xy, octave=feats.octave,
            angle=feats.angle, desc=feats.desc,
            pts=jnp.where(inlier[:, None], all_pts, 0.0), bound=inlier,
        )

        # ---- pack EVERYTHING the host needs into one f32 buffer (ints are
        # bitcast for transport; the wire format is opaque bytes either way)
        as_f = lambda a: jax.lax.bitcast_convert_type(a.astype(jnp.int32), jnp.float32)
        packed = jnp.concatenate([
            r2.Tcw.reshape(-1),                     # 16
            velocity.reshape(-1),                   # 16
            jnp.stack([
                n_matches1.astype(jnp.float32),
                r1.n_inliers.astype(jnp.float32),
                r2.n_inliers.astype(jnp.float32),
            ]),                                     # 3
            feats.xy.reshape(-1),                   # 2N
            feats.angle,                            # N
            as_f(feats.octave),                     # N
            as_f(feats.valid),                      # N
            as_f(src_prev),                         # N
            as_f(src_cand),                         # N
            as_f(inlier),                           # N
            as_f(r2.inliers & bound1),              # N (outlier reconstruction)
            as_f(in_view),                          # C
            jax.lax.bitcast_convert_type(feats.desc, jnp.float32).reshape(-1),  # 8N
        ])
        return StepOutputs(carry=new_carry, packed=packed)

    return step


class UnpackedStep(NamedTuple):
    Tcw: np.ndarray
    velocity: np.ndarray
    n_matches1: int
    n_inliers1: int
    n_inliers: int
    xy: np.ndarray
    angle: np.ndarray
    octave: np.ndarray
    valid: np.ndarray
    src_prev: np.ndarray  # [N] prev-frame feature row or -1
    src_cand: np.ndarray  # [N] candidate row or -1
    inlier: np.ndarray  # [N] bool (final pose-GN inliers among bound)
    inlier_bound1: np.ndarray  # [N] bool
    cand_in_view: np.ndarray  # [C] bool
    desc: np.ndarray  # [N, 8] uint32


def unpack_step(buf: np.ndarray, n_feat: int, n_cand: int) -> UnpackedStep:
    i = lambda a: a.view(np.int32)
    b = lambda a: a.view(np.int32).astype(bool)
    o = 0

    def take(n):
        nonlocal o
        out = buf[o : o + n]
        o += n
        return out

    Tcw = take(16).reshape(4, 4).copy()
    vel = take(16).reshape(4, 4).copy()
    counters = take(3)
    xy = take(2 * n_feat).reshape(n_feat, 2).copy()
    angle = take(n_feat).copy()
    octave = i(take(n_feat)).copy()
    valid = b(take(n_feat))
    src_prev = i(take(n_feat)).copy()
    src_cand = i(take(n_feat)).copy()
    inlier = b(take(n_feat))
    inlier_b1 = b(take(n_feat))
    cand_in_view = b(take(n_cand))
    desc = take(8 * n_feat).view(np.uint32).reshape(n_feat, 8).copy()
    assert o == len(buf), (o, len(buf))
    return UnpackedStep(
        Tcw=Tcw, velocity=vel,
        n_matches1=int(counters[0]), n_inliers1=int(counters[1]),
        n_inliers=int(counters[2]),
        xy=xy, angle=angle, octave=octave, valid=valid,
        src_prev=src_prev, src_cand=src_cand, inlier=inlier,
        inlier_bound1=inlier_b1, cand_in_view=cand_in_view, desc=desc,
    )


def carry_from_frame(frame: FrameData, map_store, velocity: Optional[np.ndarray]) -> TrackCarry:
    """Seed the device carry from a host-tracked frame (after init, reloc, or
    a keyframe/map event that invalidates the device chain)."""
    n = len(frame.xy)
    bound = (frame.mp_idx >= 0) & ~frame.outlier
    pts = np.zeros((n, 3), np.float32)
    if bound.any():
        pts[bound] = map_store.mp_pos[frame.mp_idx[bound]]
    vel = np.eye(4, dtype=np.float32) if velocity is None else velocity
    return TrackCarry(
        Tcw=jnp.asarray(frame.Tcw), velocity=jnp.asarray(vel.astype(np.float32)),
        xy=jnp.asarray(frame.xy), octave=jnp.asarray(frame.octave),
        angle=jnp.asarray(frame.angle), desc=jnp.asarray(frame.desc),
        pts=jnp.asarray(pts), bound=jnp.asarray(bound),
    )
