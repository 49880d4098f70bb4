"""Loop-closing pipeline test on a hand-built drifted map (no image pipeline).

A chain of keyframes physically returns to its start: the last KF sees the
same scene as KF 0 (same descriptors) but tracking gave it a DRIFTED pose and
its own drifted duplicate landmarks — exactly the state a real loop closure
faces. The loop closer must detect the loop (BoW + covisibility consistency),
verify it with Sim3 on the duplicated-landmark discrepancy, and pull the
drifted pose back via the essential graph.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from orbslam2_nmi_tpu.config import CameraConfig, ORBConfig, SystemConfig, TrackingConfig
from orbslam2_nmi_tpu.geometry import se3
from orbslam2_nmi_tpu.slam.keyframe_database import KeyFrameDatabase
from orbslam2_nmi_tpu.slam.loop_closing import LoopCloser
from orbslam2_nmi_tpu.slam.map_store import MapStore
from orbslam2_nmi_tpu.slam.vocabulary import Vocabulary

CAM = CameraConfig(fx=300.0, fy=300.0, cx=160.0, cy=120.0, width=320, height=240)
N_FEAT = 120
N_CHAIN = 14


def project_cam(pc):
    return (pc[:, :2] / pc[:, 2:3] * [300.0, 300.0] + [160.0, 120.0]).astype(np.float32)


@pytest.fixture
def looped_map():
    rng = np.random.default_rng(0)
    cfg = SystemConfig(
        camera=CAM,
        orb=ORBConfig(n_features=N_FEAT, n_levels=4),
        tracking=TrackingConfig(max_keyframes=32, max_map_points=8192, max_features=N_FEAT),
    )
    m = MapStore(cfg)

    # camera-frame scene points seen by every keyframe (fresh scene per KF)
    pc_scene = np.stack(
        [rng.uniform(-3, 3, N_FEAT), rng.uniform(-2, 2, N_FEAT), rng.uniform(6, 12, N_FEAT)], -1
    ).astype(np.float32)
    uv_scene = project_cam(pc_scene)
    descs0 = rng.integers(0, 2**32, (N_FEAT, 8), dtype=np.uint32)

    # ground truth: a loop that returns exactly to the start pose
    gt = []
    for i in range(N_CHAIN):
        if i == 0 or i == N_CHAIN - 1:
            gt.append(np.eye(4, dtype=np.float32))
        else:
            s = i / (N_CHAIN - 1) * 2 * np.pi
            gt.append(
                np.asarray(
                    se3.se3_exp(
                        jnp.asarray([1.5 * np.sin(s), 0.0, 1.5 * (1 - np.cos(s)), 0, 0, 0], jnp.float32)
                    )
                )
            )
    # drifted estimates: per-step bias accumulates; first exact, last drifted
    est = [gt[0]]
    bias = np.asarray(se3.se3_exp(jnp.asarray([0.03, 0.015, 0.0, 0.0, 0.004, 0.0], jnp.float32)))
    for i in range(1, N_CHAIN):
        rel = gt[i] @ np.linalg.inv(gt[i - 1])
        est.append((bias @ rel @ est[i - 1]).astype(np.float32))

    prev_point_ids = None
    for i in range(N_CHAIN):
        descs = descs0 if (i == 0 or i == N_CHAIN - 1) else rng.integers(
            0, 2**32, (N_FEAT, 8), dtype=np.uint32
        )
        k = m.add_keyframe(
            est[i], i, float(i), uv_scene, np.zeros(N_FEAT, np.int32),
            np.zeros(N_FEAT, np.float32), descs, np.ones(N_FEAT, bool),
        )
        # landmarks placed from the DRIFTED pose + true camera-frame geometry;
        # only slots 0..89 carry own points, slots 90..119 stay free so the
        # previous keyframe can re-observe them (covisibility edges)
        Ti = np.linalg.inv(est[i])
        pw = (pc_scene @ Ti[:3, :3].T + Ti[:3, 3]).astype(np.float32)
        ids = []
        for f in range(90):
            p = m.add_map_point(pw[f], descs[f], k, np.zeros(3, np.float32))
            m.add_observation(k, f, p)
            ids.append(p)
        # chain covisibility: the previous KF re-observes 30 of this KF's points
        if prev_point_ids is not None and k > 0:
            for j in range(30):
                m.add_observation(k - 1, 90 + j, ids[j])
        prev_point_ids = ids

    vocab = Vocabulary.train(
        np.concatenate([m.kf_feat_desc[i] for i in range(N_CHAIN)]), k=5, depth=3, seed=2
    )
    db = KeyFrameDatabase(vocab, 32)
    return cfg, m, db, gt, est


def test_loop_detected_and_corrected(looped_map):
    cfg, m, db, gt, est = looped_map
    lc = LoopCloser(cfg, m, db, local_mapper=None)
    lc.covisibility_consistency_th = 0  # single-shot detection for the test
    closed = False
    for k in range(N_CHAIN):
        closed |= lc.process_keyframe(k)
    assert closed, "loop between first and last KF not closed"
    err_before = np.linalg.norm(est[-1][:3, 3] - gt[-1][:3, 3])
    err_after = np.linalg.norm(m.kf_Tcw[N_CHAIN - 1][:3, 3] - gt[-1][:3, 3])
    assert err_after < 0.5 * err_before, (err_before, err_after)


def test_no_false_loop_without_revisit(looped_map):
    cfg, m, db, gt, est = looped_map
    lc = LoopCloser(cfg, m, db, local_mapper=None)
    lc.covisibility_consistency_th = 0
    closed = False
    for k in range(N_CHAIN - 1):  # exclude the revisit keyframe
        closed |= lc.process_keyframe(k)
    assert not closed


def test_true_loop_passes_all_verification_gates(looped_map):
    """ComputeSim3 parity gates (LoopClosing.cc:337-395): >= 20 optimized
    inliers after SearchBySim3 + OptimizeSim3, >= 40 total matches after the
    Scw projection search."""
    cfg, m, db, gt, est = looped_map
    lc = LoopCloser(cfg, m, db, local_mapper=None)
    for k in range(N_CHAIN):
        db.add(k, m.kf_feat_desc[k], m.kf_feat_valid[k])
    ok, Scw, matched_cur, loop_mps = lc._compute_sim3(N_CHAIN - 1, 0)
    assert ok
    assert int((matched_cur >= 0).sum()) >= 40
    assert len(loop_mps) >= 90


def test_near_miss_loop_rejected_by_match_gates(looped_map):
    """A candidate with only ~25 genuinely shared features used to pass the
    round-1 raw-RANSAC >= 20 gate; the reference's >= 40 total-match gate
    (LoopClosing.cc:391) must reject it."""
    cfg, m, db, gt, est = looped_map
    rng = np.random.default_rng(11)
    last = N_CHAIN - 1
    keep = 25
    newd = rng.integers(0, 2**32, (N_FEAT - keep, 8), dtype=np.uint32)
    m.kf_feat_desc[last, keep:] = newd
    for f in range(keep, 90):
        p = int(m.kf_mp_idx[last, f])
        if p >= 0:
            m.mp_desc[p] = newd[f - keep]
    lc = LoopCloser(cfg, m, db, local_mapper=None)
    for k in range(N_CHAIN):
        db.add(k, m.kf_feat_desc[k], m.kf_feat_valid[k])
    ok, *_ = lc._compute_sim3(last, 0)
    assert not ok, "near-miss loop with ~25 true matches must be rejected"


def test_loop_fusion_removes_seam_duplicates(looped_map):
    """After a true loop closes, the revisit KF's duplicate landmarks must be
    replaced by the loop side's points (loop fusion LoopClosing.cc:528-547 +
    SearchAndFuse :595-627)."""
    cfg, m, db, gt, est = looped_map
    last = N_CHAIN - 1
    own = [p for p in range(m.n_points) if m.mp_first_kf[p] == last and m.mp_valid[p]]
    assert len(own) == 90
    lc = LoopCloser(cfg, m, db, local_mapper=None)
    lc.covisibility_consistency_th = 0
    closed = False
    for k in range(N_CHAIN):
        closed |= lc.process_keyframe(k)
    assert closed
    surviving = int(sum(bool(m.mp_valid[p]) for p in own))
    assert surviving <= len(own) // 2, (
        f"{surviving}/{len(own)} seam duplicates survived the loop fusion"
    )
