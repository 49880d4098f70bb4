"""BoW+PnP relocalization with the guided-projection expansion loop.

Parity target: Tracking::Relocalization (Tracking.cc:1596-1753) — after PnP,
a coarse SearchByProjection (window 10, Hamming 100) and a narrow pass
(window 3, Hamming 64) expand the inlier set; the pose is accepted only at
>= 50 inliers. The scenario makes the initial descriptor match weak (decoy
features defeat the 0.75 ratio test) while the projection windows recover the
full correspondence set — the case where round-1's single-shot PnP returned
a handful of inliers.
"""

import numpy as np
import jax.numpy as jnp

from orbslam2_nmi_tpu.config import CameraConfig, ORBConfig, SystemConfig, TrackingConfig
from orbslam2_nmi_tpu.ops import matching
from orbslam2_nmi_tpu.slam.frame import FrameData
from orbslam2_nmi_tpu.slam.map_store import MapStore
from orbslam2_nmi_tpu.slam.tracking import Tracker, TrackingState

CAM = CameraConfig(fx=300.0, fy=300.0, cx=160.0, cy=120.0, width=320, height=240)
N_MP = 120
N_UNIQUE = 20  # map points whose descriptors survive the ratio test


class _OneCandidateDB:
    def __init__(self, kf):
        self.kf = kf

    def detect_relocalization_candidates(self, map_store, desc, valid):
        return [self.kf]


class _FakeSystem:
    def __init__(self, db):
        self.database = db


def _flip_bits(desc, n_bits, rng):
    out = desc.copy()
    for _ in range(n_bits):
        w = rng.integers(0, 8)
        b = rng.integers(0, 32)
        out[w] ^= np.uint32(1 << b)
    return out


def _build_scene(seed=0):
    rng = np.random.default_rng(seed)
    cfg = SystemConfig(
        camera=CAM,
        orb=ORBConfig(n_features=256, n_levels=4),
        tracking=TrackingConfig(max_keyframes=8, max_map_points=512, max_features=256),
    )
    m = MapStore(cfg)

    pw = np.stack(
        [rng.uniform(-3, 3, N_MP), rng.uniform(-2, 2, N_MP), rng.uniform(6, 12, N_MP)],
        -1,
    ).astype(np.float32)
    descs = rng.integers(0, 2**32, (N_MP, 8), dtype=np.uint32)

    def project(T, p):
        pc = p @ T[:3, :3].T + T[:3, 3]
        return (pc[:, :2] / pc[:, 2:3] * [300.0, 300.0] + [160.0, 120.0]).astype(np.float32)

    T_kf = np.eye(4, dtype=np.float32)
    uv_kf = project(T_kf, pw)
    F = 256
    feat_xy = np.zeros((F, 2), np.float32)
    feat_desc = np.zeros((F, 8), np.uint32)
    feat_valid = np.zeros(F, bool)
    feat_xy[:N_MP] = uv_kf
    feat_desc[:N_MP] = descs
    feat_valid[:N_MP] = True
    k = m.add_keyframe(
        T_kf, 0, 0.0, feat_xy, np.zeros(F, np.int32), np.zeros(F, np.float32),
        feat_desc, feat_valid,
    )
    for f in range(N_MP):
        p = m.add_map_point(pw[f], descs[f], k, np.zeros(3, np.float32))
        m.add_observation(k, f, p)
        m.update_point_stats(p, CAM.K, cfg.orb.scale_factor, cfg.orb.n_levels)

    # the frame: slightly displaced true pose, noisy copies of all descriptors,
    # plus decoys near the confusable descriptors at far-away pixels
    T_fr = np.eye(4, dtype=np.float32)
    T_fr[:3, 3] = [0.15, -0.05, 0.1]
    uv_fr = project(T_fr, pw)
    fr_xy = np.zeros((F, 2), np.float32)
    fr_desc = np.zeros((F, 8), np.uint32)
    fr_valid = np.zeros(F, bool)
    fr_xy[:N_MP] = uv_fr
    for f in range(N_MP):
        fr_desc[f] = _flip_bits(descs[f], 9, rng)
    fr_valid[:N_MP] = True
    # decoys for the non-unique map points: 10-bit-off descriptors far away
    n_decoy = N_MP - N_UNIQUE
    for i in range(n_decoy):
        f = N_MP + i
        fr_desc[f] = _flip_bits(descs[N_UNIQUE + i], 10, rng)
        fr_xy[f] = [5.0 + (i % 16) * 2.0, 5.0 + (i // 16) * 2.0]
        fr_valid[f] = True
    frame = FrameData(
        frame_id=5, timestamp=0.5, Tcw=None, xy=fr_xy, xy_raw=fr_xy,
        octave=np.zeros(F, np.int32), angle=np.zeros(F, np.float32),
        desc=fr_desc, valid=fr_valid,
    )
    return cfg, m, k, frame, T_fr


def test_initial_match_is_weak():
    """The decoys must defeat the ratio test so the scenario actually
    exercises the expansion (sanity check of the setup)."""
    cfg, m, k, frame, T_fr = _build_scene()
    idx, _ = matching.match_descriptors(
        jnp.asarray(m.kf_feat_desc[k]), jnp.asarray(m.kf_mp_idx[k] >= 0),
        jnp.asarray(frame.desc), jnp.asarray(frame.valid),
        max_dist=matching.TH_LOW, nn_ratio=0.75,
        angle_a=jnp.asarray(m.kf_feat_angle[k]), angle_b=jnp.asarray(frame.angle),
        check_rotation=True,
    )
    n = int((np.asarray(idx) >= 0).sum())
    assert 15 <= n < 50, f"setup broken: {n} initial matches"


def test_relocalization_expands_to_50_inliers():
    cfg, m, k, frame, T_fr = _build_scene()
    tr = Tracker(cfg, m, system=_FakeSystem(_OneCandidateDB(k)))
    tr.state = TrackingState.LOST
    ok = tr._relocalize(frame)
    assert ok, "relocalization failed"
    n_bound = int(((frame.mp_idx >= 0) & ~frame.outlier).sum())
    assert n_bound >= 50, f"only {n_bound} inliers after expansion"
    # recovered pose close to the true frame pose
    assert np.abs(frame.Tcw[:3, 3] - T_fr[:3, 3]).max() < 0.05
    assert tr.ref_kf == k


def test_relocalization_rejects_below_50():
    """With the expansion unable to reach 50 inliers (KF has too few points),
    the reference's >= 50 acceptance gate must reject."""
    cfg, m, k, frame, T_fr = _build_scene()
    # invalidate most map points: only 40 remain
    for p in range(40, N_MP):
        m.remove_map_point(p)
    tr = Tracker(cfg, m, system=_FakeSystem(_OneCandidateDB(k)))
    tr.state = TrackingState.LOST
    assert not tr._relocalize(frame)
