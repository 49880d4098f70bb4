"""Tracker unit behaviors: per-axis drift reset + UpdateLastFrame re-anchoring.

Parity targets: Tracking.cc:600-612 (only searched NMI axes reset their drift
accumulators) and Tracking.cc:1020 (UpdateLastFrame recomputes the last
frame's pose from its reference keyframe before motion-model tracking).
"""

import numpy as np
import pytest

from orbslam2_nmi_tpu.config import CameraConfig, SystemConfig, TrackingConfig
from orbslam2_nmi_tpu.slam.frame import FrameData
from orbslam2_nmi_tpu.slam.map_store import MapStore
from orbslam2_nmi_tpu.slam.nmi.localizer import NMIOutcome
from orbslam2_nmi_tpu.slam.tracking import Tracker


def _make_tracker(nmi=None):
    cfg = SystemConfig(
        camera=CameraConfig(fx=100, fy=100, cx=50, cy=50, width=100, height=100),
        tracking=TrackingConfig(max_keyframes=8, max_map_points=64, max_features=16),
    )
    m = MapStore(cfg)
    return Tracker(cfg, m, nmi_localizer=nmi), m


def _frame(fid=0):
    n = 4
    return FrameData(
        frame_id=fid, timestamp=0.0, Tcw=np.eye(4, dtype=np.float32),
        xy=np.zeros((n, 2), np.float32), xy_raw=np.zeros((n, 2), np.float32),
        octave=np.zeros(n, np.int32), angle=np.zeros(n, np.float32),
        desc=np.zeros((n, 8), np.uint32), valid=np.ones(n, bool),
    )


class _FakeNMI:
    """Returns a fixed outcome reporting which axes the kernel searched."""

    def __init__(self, num_synth, num_warp):
        self.num_synth = num_synth
        self.num_warp = num_warp
        self.search_scale = 1.0

    def relocalize_strategy(self, gray, Tcw, **kw):
        return NMIOutcome(
            Tcw=Tcw, nmi=0.5, relocalized=True, failed=False, iterations=1,
            previous_poses=[], num_synth=self.num_synth, num_warp=self.num_warp,
        )


def test_drift_reset_is_per_axis():
    tr, _ = _make_tracker(nmi=_FakeNMI(num_synth=(3, 1, 3), num_warp=(1, 3, 1)))
    tr._gray = np.zeros((8, 8), np.float32)
    tr.dist_since_nmi[:] = [1.0, 2.0, 3.0]
    tr.rot_since_nmi[:] = [0.1, 0.2, 0.3]
    assert tr._run_nmi(_frame(), initializing=False)
    # searched translation axes x,z reset; collapsed y keeps its drift
    np.testing.assert_allclose(tr.dist_since_nmi, [0.0, 2.0, 0.0])
    # searched rotation axis y resets; x,z keep theirs
    np.testing.assert_allclose(tr.rot_since_nmi, [0.1, 0.0, 0.3])


def test_update_last_frame_reanchors_from_ref_kf():
    tr, m = _make_tracker()
    feats = dict(
        feat_xy=np.zeros((4, 2), np.float32), feat_octave=np.zeros(4, np.int32),
        feat_angle=np.zeros(4, np.float32), feat_desc=np.zeros((4, 8), np.uint32),
        feat_valid=np.ones(4, bool),
    )
    T_kf = np.eye(4, dtype=np.float32)
    T_kf[:3, 3] = [1.0, 0.0, 0.0]
    k = m.add_keyframe(T_kf, 0, 0.0, **feats)

    last = _frame(fid=1)
    Tcr = np.eye(4, dtype=np.float32)
    Tcr[:3, 3] = [0.0, 0.0, 0.5]
    last.ref_kf = k
    last.Tcr = Tcr
    last.Tcw = (Tcr @ T_kf).astype(np.float32)

    # BA refines the keyframe: the re-anchored last-frame pose must follow
    T_kf2 = T_kf.copy()
    T_kf2[:3, 3] = [1.0, 0.2, -0.1]
    m.kf_Tcw[k] = T_kf2
    tr._update_last_frame(last)
    np.testing.assert_allclose(last.Tcw, Tcr @ T_kf2, atol=1e-6)


def test_update_last_frame_walks_culled_ref():
    tr, m = _make_tracker()
    feats = dict(
        feat_xy=np.zeros((4, 2), np.float32), feat_octave=np.zeros(4, np.int32),
        feat_angle=np.zeros(4, np.float32), feat_desc=np.zeros((4, 8), np.uint32),
        feat_valid=np.ones(4, bool),
    )
    T0 = np.eye(4, dtype=np.float32)
    T1 = np.eye(4, dtype=np.float32)
    T1[:3, 3] = [0.5, 0.0, 0.0]
    k0 = m.add_keyframe(T0, 0, 0.0, **feats)
    k1 = m.add_keyframe(T1, 1, 0.1, **feats)
    m.kf_parent[k1] = k0

    last = _frame(fid=2)
    last.ref_kf = k1
    last.Tcr = np.eye(4, dtype=np.float32)
    last.Tcw = T1.copy()

    m.remove_keyframe(k1)  # stores kf_Tcp[k1]
    tr._update_last_frame(last)
    np.testing.assert_allclose(last.Tcw, m.kf_Tcp[k1] @ T0, atol=1e-6)


def test_need_new_keyframe_respects_mapper_idle():
    """Async-mode keyframe policy (Tracking.cc:1259-1302 + the documented
    relaxation): with the mapper busy, the in-flight local BA is interrupted;
    the keyframe is still created when nothing further is QUEUED (bounded
    queue of 1), and refused when the queue already holds a keyframe."""
    from orbslam2_nmi_tpu.config import CameraConfig, ORBConfig, SystemConfig, TrackingConfig
    from orbslam2_nmi_tpu.slam.frame import FrameData
    from orbslam2_nmi_tpu.slam.map_store import MapStore
    from orbslam2_nmi_tpu.slam.tracking import Tracker

    cfg = SystemConfig(
        camera=CameraConfig(fx=300, fy=300, cx=160, cy=120, width=320, height=240),
        orb=ORBConfig(n_features=64, n_levels=2),
        tracking=TrackingConfig(
            max_frames=10, min_frames=0, max_keyframes=8, max_map_points=256,
            max_features=64,
        ),
    )
    m = MapStore(cfg)
    rng = np.random.default_rng(0)
    m.add_keyframe(
        np.eye(4, dtype=np.float32), 0, 0.0,
        np.zeros((64, 2), np.float32), np.zeros(64, np.int32),
        np.zeros(64, np.float32), rng.integers(0, 2**32, (64, 8), dtype=np.uint32),
        np.ones(64, bool),
    )

    class _Pipe:
        def __init__(self, is_idle, q_empty=True):
            self._idle = is_idle
            self._q_empty = q_empty
            self.interrupted = False

        def idle(self):
            return self._idle

        def queue_empty(self):
            return self._q_empty

        def interrupt_ba(self):
            self.interrupted = True

    class _Sys:
        pass

    sysm = _Sys()
    tr = Tracker(cfg, m, system=sysm)
    tr.ref_kf = 0
    tr.last_kf_frame_id = 0

    def frame(fid):
        f = FrameData(
            frame_id=fid, timestamp=fid / 10.0, Tcw=np.eye(4, dtype=np.float32),
            xy=np.zeros((64, 2), np.float32), xy_raw=np.zeros((64, 2), np.float32),
            octave=np.zeros(64, np.int32), angle=np.zeros(64, np.float32),
            desc=np.zeros((64, 8), np.uint32), valid=np.ones(64, bool),
        )
        return f

    # due by c1a cadence, mapper idle -> create
    sysm.pipeline = _Pipe(True)
    assert tr._need_new_keyframe(frame(12), n_inliers=30)
    assert not sysm.pipeline.interrupted
    # same frame, mapper busy but queue empty -> create anyway, BA interrupted
    sysm.pipeline = _Pipe(False, q_empty=True)
    assert tr._need_new_keyframe(frame(12), n_inliers=30)
    assert sysm.pipeline.interrupted
    # mapper busy AND a keyframe already queued -> refuse (bounded queue)
    sysm.pipeline = _Pipe(False, q_empty=False)
    assert not tr._need_new_keyframe(frame(12), n_inliers=30)
    assert sysm.pipeline.interrupted
    # not due -> no interrupt either
    sysm.pipeline = _Pipe(False)
    assert not tr._need_new_keyframe(frame(5), n_inliers=200)
    assert not sysm.pipeline.interrupted


def test_map_point_slot_recycling():
    """Culled map-point slots re-enter service after a 4-keyframe quarantine
    once the bump space is exhausted — long-sequence churn must not exhaust
    max_map_points (the reference's pointer-based map has no such cap)."""
    from orbslam2_nmi_tpu.config import CameraConfig, ORBConfig, SystemConfig, TrackingConfig
    from orbslam2_nmi_tpu.slam.map_store import MapStore

    cfg = SystemConfig(
        camera=CameraConfig(fx=300, fy=300, cx=160, cy=120, width=320, height=240),
        orb=ORBConfig(n_features=64, n_levels=2),
        tracking=TrackingConfig(
            max_frames=10, max_keyframes=16, max_map_points=8, max_features=64
        ),
    )
    m = MapStore(cfg)
    rng = np.random.default_rng(0)

    def add_kf():
        m.add_keyframe(
            np.eye(4, dtype=np.float32), int(m.n_keyframes), 0.0,
            np.zeros((64, 2), np.float32), np.zeros(64, np.int32),
            np.zeros(64, np.float32),
            rng.integers(0, 2**32, (64, 8), dtype=np.uint32), np.ones(64, bool),
        )

    def add_pt():
        return m.add_map_point(
            np.zeros(3, np.float32), np.zeros(8, np.uint32), 0, np.zeros(3, np.float32)
        )

    add_kf()
    pts = [add_pt() for _ in range(8)]  # bump space full
    m.remove_map_point(pts[0])
    m.remove_map_point(pts[1])
    # quarantine: freed this keyframe -> not yet reusable
    with pytest.raises(RuntimeError):
        add_pt()
    for _ in range(4):
        add_kf()
    p = add_pt()  # oldest freed slot recycled
    assert p == pts[0]
    assert m.mp_valid[p]
    q = add_pt()
    assert q == pts[1]
    with pytest.raises(RuntimeError):
        add_pt()  # queue drained again


def test_map_point_slot_recycling_with_observations():
    """The practical case (r4 ADVICE, medium): every culled point in a real run
    has >=1 observation, and dropping the last observation marks the point
    invalid BEFORE remove_map_point's old liveness check ran — those slots
    leaked. They must enter the free queue, exactly once, however the point
    dies (explicit cull, rebinding steals the last observation, or double
    remove)."""
    from orbslam2_nmi_tpu.config import CameraConfig, ORBConfig, SystemConfig, TrackingConfig
    from orbslam2_nmi_tpu.slam.map_store import MapStore

    cfg = SystemConfig(
        camera=CameraConfig(fx=300, fy=300, cx=160, cy=120, width=320, height=240),
        orb=ORBConfig(n_features=64, n_levels=2),
        tracking=TrackingConfig(
            max_frames=10, max_keyframes=16, max_map_points=4, max_features=64
        ),
    )
    m = MapStore(cfg)
    rng = np.random.default_rng(1)

    def add_kf():
        m.add_keyframe(
            np.eye(4, dtype=np.float32), int(m.n_keyframes), 0.0,
            np.zeros((64, 2), np.float32), np.zeros(64, np.int32),
            np.zeros(64, np.float32),
            rng.integers(0, 2**32, (64, 8), dtype=np.uint32), np.ones(64, bool),
        )

    def add_pt():
        return m.add_map_point(
            np.zeros(3, np.float32), np.zeros(8, np.uint32), 0, np.zeros(3, np.float32)
        )

    add_kf()
    add_kf()
    pts = [add_pt() for _ in range(4)]  # bump space full
    # every point observed from both keyframes (feature slot = point id)
    for p in pts:
        m.add_observation(0, p, p)
        m.add_observation(1, p, p)
    # cull an observed point -> slot must be queued despite remove_observation
    # having cleared mp_valid first
    m.remove_map_point(pts[0])
    assert not m.mp_valid[pts[0]]
    # double remove must not queue the slot twice
    m.remove_map_point(pts[0])
    # a point dying because a rebinding steals its last observation also frees
    m.remove_observation(0, pts[1])
    m.add_observation(1, pts[1], pts[2])  # steals pts[1]'s last observation
    assert not m.mp_valid[pts[1]]
    for _ in range(4):
        add_kf()
    a, b = add_pt(), add_pt()
    assert {a, b} == {pts[0], pts[1]}
    with pytest.raises(RuntimeError):
        add_pt()  # exactly two slots were queued, no duplicates


def test_observation_cap_evicts_oldest_with_exact_covis():
    """When a point's observation list saturates, the OLDEST observation is
    evicted with full accounting (reference observations are unbounded,
    MapPoint.h mObservations). Pre-r5 the new entry was silently dropped:
    kf_mp_idx stayed bound while BA/covis never saw the observation, and the
    asymmetric increments left permanent phantom covisibility weights."""
    from orbslam2_nmi_tpu.config import CameraConfig, ORBConfig, SystemConfig, TrackingConfig
    from orbslam2_nmi_tpu.slam import map_store as ms
    from orbslam2_nmi_tpu.slam.map_store import MapStore

    cfg = SystemConfig(
        camera=CameraConfig(fx=300, fy=300, cx=160, cy=120, width=320, height=240),
        orb=ORBConfig(n_features=64, n_levels=2),
        tracking=TrackingConfig(
            max_frames=10, max_keyframes=ms.MAX_OBS_PER_POINT + 8,
            max_map_points=8, max_features=64,
        ),
    )
    m = MapStore(cfg)
    rng = np.random.default_rng(2)
    M = ms.MAX_OBS_PER_POINT
    for _ in range(M + 4):
        m.add_keyframe(
            np.eye(4, dtype=np.float32), int(m.n_keyframes), 0.0,
            np.zeros((64, 2), np.float32), np.zeros(64, np.int32),
            np.zeros(64, np.float32),
            rng.integers(0, 2**32, (64, 8), dtype=np.uint32), np.ones(64, bool),
        )
    p = m.add_map_point(
        np.zeros(3, np.float32), np.zeros(8, np.uint32), 0, np.zeros(3, np.float32)
    )
    for k in range(M + 4):
        m.add_observation(k, 0, p)
    # list stays at capacity holding the NEWEST observers
    assert m.mp_obs_n[p] == M
    assert set(m.mp_obs_kf[p, :M].tolist()) == set(range(4, M + 4))
    # evicted keyframes were unbound
    for k in range(4):
        assert m.kf_mp_idx[k, 0] == -1
    # covisibility is exactly consistent with the surviving observer set:
    # every listed pair has weight 1 via this point, evicted pairs weight 0
    assert m.covis[0, 1] == 0 and m.covis[3, 5] == 0
    assert m.covis[4, 5] == 1 and m.covis[4, M + 3] == 1
    # full teardown returns the matrix to zero — no phantom weights
    m.remove_map_point(p)
    assert int(np.abs(m.covis).sum()) == 0


def test_spanning_tree_walk_after_chained_culls():
    """Trajectory recomposition must stay exact when a culled keyframe's
    PARENT is culled later: the child's stored Tcp was relative to the
    removed parent, so the hop must be composed into it when the parent
    goes (System.cc:551-556 walk semantics). Pre-r5 the child was silently
    re-parented without composition and recomposed frames landed meters
    off (isolated err_final spikes in CIRCUIT_DIAG while online error was
    centimeters)."""
    from orbslam2_nmi_tpu.config import CameraConfig, ORBConfig, SystemConfig, TrackingConfig
    from orbslam2_nmi_tpu.io.trajectory import recompose_trajectory
    from orbslam2_nmi_tpu.slam.map_store import MapStore

    cfg = SystemConfig(
        camera=CameraConfig(fx=300, fy=300, cx=160, cy=120, width=320, height=240),
        orb=ORBConfig(n_features=16, n_levels=2),
        tracking=TrackingConfig(
            max_frames=10, max_keyframes=8, max_map_points=8, max_features=16
        ),
    )
    m = MapStore(cfg)
    rng = np.random.default_rng(3)

    def pose(i):
        T = np.eye(4, dtype=np.float32)
        T[:3, 3] = [0.3 * i, 0.1 * i, 0.0]
        return T

    for i in range(4):
        m.add_keyframe(
            pose(i), i, 0.0, np.zeros((16, 2), np.float32),
            np.zeros(16, np.int32), np.zeros(16, np.float32),
            rng.integers(0, 2**32, (16, 8), dtype=np.uint32), np.ones(16, bool),
        )
        m.kf_parent[i] = i - 1
    # a frame tracked relative to KF 3
    T_f = pose(5)
    rows = [(5, 0.2, (T_f @ np.linalg.inv(pose(3))).astype(np.float32), 3, False, [])]
    # cull 3 (parent 2), then cull 2 (parent 1): 3's Tcp must fold in 2's hop
    m.remove_keyframe(3)
    m.remove_keyframe(2)
    out = recompose_trajectory(rows, m)
    assert len(out) == 1
    np.testing.assert_allclose(out[0][2], T_f, atol=1e-5)
