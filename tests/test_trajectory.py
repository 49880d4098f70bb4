"""Relative-pose trajectory bookkeeping + save-time recomposition.

Parity target: the reference stores each frame's pose relative to its
reference keyframe (Tracking.cc:667-691) and recomposes `Tcr * Trw` in
SaveFullTrajectory (System.cc:514-599), walking the spanning tree past culled
keyframes — so loop closures / global BA / NMI anchoring retroactively
correct the whole saved trajectory.
"""

import numpy as np
import pytest

from orbslam2_nmi_tpu.config import CameraConfig, SystemConfig, TrackingConfig
from orbslam2_nmi_tpu.io.trajectory import ate_rmse, recompose_trajectory
from orbslam2_nmi_tpu.slam.map_store import MapStore


def _se3(rot_z: float, t):
    c, s = np.cos(rot_z), np.sin(rot_z)
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)
    T[:3, 3] = t
    return T


@pytest.fixture
def small_map():
    cfg = SystemConfig(
        camera=CameraConfig(fx=100, fy=100, cx=50, cy=50, width=100, height=100),
        tracking=TrackingConfig(max_keyframes=8, max_map_points=64, max_features=16),
    )
    m = MapStore(cfg)
    feats = dict(
        feat_xy=np.zeros((4, 2), np.float32),
        feat_octave=np.zeros(4, np.int32),
        feat_angle=np.zeros(4, np.float32),
        feat_desc=np.zeros((4, 8), np.uint32),
        feat_valid=np.ones(4, bool),
    )
    for i in range(3):
        m.add_keyframe(_se3(0.1 * i, [float(i), 0, 0]), i * 10, float(i), **feats)
    return m


def test_recomposition_absorbs_keyframe_correction(small_map):
    """A post-hoc pose-graph/GBA correction to a reference KF must reach the
    recomposed trajectory (the round-1 build froze absolute poses)."""
    m = small_map
    Tcw_frame = _se3(0.15, [1.5, 0.2, 0.0])
    Tcr = Tcw_frame @ np.linalg.inv(m.kf_Tcw[1])
    rows = [(11, 1.1, Tcr.astype(np.float32), 1, False, [])]

    before = recompose_trajectory(rows, m)
    assert np.allclose(before[0][2], Tcw_frame, atol=1e-5)

    # simulate a loop correction moving KF 1
    corr = _se3(-0.05, [0.0, 0.0, 0.3])
    m.kf_Tcw[1] = (m.kf_Tcw[1] @ corr).astype(np.float32)
    after = recompose_trajectory(rows, m)
    expect = Tcr @ m.kf_Tcw[1]
    assert np.allclose(after[0][2], expect, atol=1e-5)
    assert not np.allclose(after[0][2], before[0][2], atol=1e-4)


def test_recomposition_walks_spanning_tree_past_culled_ref(small_map):
    """System.cc:551-556: if the reference KF was culled, accumulate mTcp
    relatives up the spanning tree to the surviving ancestor."""
    m = small_map
    m.kf_parent[2] = 1
    m.kf_parent[1] = 0
    Tcw_frame = _se3(0.22, [2.3, 0.0, 0.1])
    Tcr = Tcw_frame @ np.linalg.inv(m.kf_Tcw[2])
    rows = [(21, 2.1, Tcr.astype(np.float32), 2, False, [])]

    m.remove_keyframe(2)  # stores kf_Tcp[2] = Tcw[2] @ inv(Tcw[1])
    out = recompose_trajectory(rows, m)
    # Trw = Tcp[2] @ Tcw[1]; Tcw = Tcr @ Trw == original absolute pose
    assert len(out) == 1
    assert np.allclose(out[0][2], Tcw_frame, atol=1e-5)

    # and a correction to the surviving ancestor still propagates
    corr = _se3(0.07, [0.1, -0.2, 0.0])
    m.kf_Tcw[1] = (m.kf_Tcw[1] @ corr).astype(np.float32)
    out2 = recompose_trajectory(rows, m)
    expect = Tcr @ m.kf_Tcp[2] @ m.kf_Tcw[1]
    assert np.allclose(out2[0][2], expect, atol=1e-5)


def test_lost_rows_are_skipped_and_kf_rows_flagged(small_map):
    m = small_map
    eye = np.eye(4, dtype=np.float32)
    m.kf_nmi_reloc[1] = True
    rows = [
        (10, 1.0, eye, 1, False, []),  # the KF itself (Tcr = I)
        (11, 1.1, _se3(0.01, [0.1, 0, 0]), 1, False, []),
        (12, 1.2, eye, 1, True, []),  # lost — replicated row
    ]
    out = recompose_trajectory(rows, m)
    assert [r[0] for r in out] == [10, 11]
    assert "KF" in out[0][3] and "NMI" in out[0][3]
    assert out[1][3] == []


def test_full_pipeline_trajectory_absorbs_gba(tmp_path):
    """End-to-end: run a short synthetic sequence, then nudge every keyframe
    pose (as a loop/GBA would) and check the saved FullTrajectory moved."""
    from orbslam2_nmi_tpu.io.synthetic import SyntheticWorld
    from tests.test_slam_e2e import H, N_FRAMES, W, make_system

    world = SyntheticWorld.generate(seed=3)
    sys_ = make_system(world)
    sys_.output_dir = str(tmp_path)
    sys_.set_init_poses(world.pose_at(0, N_FRAMES), world.pose_at(4, N_FRAMES))
    for i in range(14):
        sys_.track_monocular(world.render_frame(i, N_FRAMES, W, H), i / 10.0)
    assert sys_.map.n_keyframes >= 3

    base = [r[2] for r in sys_.full_trajectory()]
    corr = _se3(0.0, [0.5, 0.0, 0.0])
    for k in sys_.map.valid_keyframe_indices():
        sys_.map.kf_Tcw[k] = (sys_.map.kf_Tcw[k] @ corr).astype(np.float32)
    moved = [r[2] for r in sys_.full_trajectory()]
    assert len(base) == len(moved) >= 8
    deltas = [np.abs(a - b).max() for a, b in zip(base, moved)]
    assert min(deltas) > 0.1  # every frame absorbed the correction
    sys_.save_full_trajectory("Full")
    txt = (tmp_path / "Full.txt").read_text().strip().splitlines()
    assert len(txt) == len(moved)
    sys_.shutdown()
