"""Asynchronous global BA: abort protocol + spanning-tree propagation.

Parity target: LoopClosing::RunGlobalBundleAdjustment (LoopClosing.cc:652-756)
— the BA runs on its own thread (mbStopGBA/mnFullBAIdx abort via a generation
counter here), and keyframes/map points created DURING the solve receive the
correction through the spanning tree / their reference keyframe.
"""

import time

import numpy as np
import pytest

from orbslam2_nmi_tpu.config import CameraConfig, ORBConfig, SystemConfig, TrackingConfig
from orbslam2_nmi_tpu.slam.local_mapping import LocalMapper
from orbslam2_nmi_tpu.slam.map_store import MapStore


def _cfg():
    return SystemConfig(
        camera=CameraConfig(fx=300, fy=300, cx=160, cy=120, width=320, height=240),
        orb=ORBConfig(n_features=64, n_levels=4),
        tracking=TrackingConfig(max_keyframes=16, max_map_points=1024, max_features=64),
    )


def _feats(rng, uv):
    n = len(uv)
    return dict(
        feat_xy=uv.astype(np.float32),
        feat_octave=np.zeros(n, np.int32),
        feat_angle=np.zeros(n, np.float32),
        feat_desc=rng.integers(0, 2**32, (n, 8), dtype=np.uint32),
        feat_valid=np.ones(n, bool),
    )


@pytest.fixture
def small_ba_world():
    """3 keyframes observing a shared point cloud (a solvable BA problem)."""
    rng = np.random.default_rng(5)
    cfg = _cfg()
    m = MapStore(cfg)
    lm = LocalMapper(cfg, m)
    pw = np.stack(
        [rng.uniform(-3, 3, 60), rng.uniform(-2, 2, 60), rng.uniform(6, 12, 60)], -1
    ).astype(np.float32)

    def project(T):
        pc = pw @ T[:3, :3].T + T[:3, 3]
        return (pc[:, :2] / pc[:, 2:3] * [300.0, 300.0] + [160.0, 120.0]).astype(np.float32)

    poses = []
    for i in range(3):
        T = np.eye(4, dtype=np.float32)
        T[:3, 3] = [0.3 * i, 0.0, 0.1 * i]
        poses.append(T)
        m.add_keyframe(T, i, float(i), **_feats(rng, project(T)))
    pids = []
    for f in range(60):
        p = m.add_map_point(pw[f], m.kf_feat_desc[0, f], 0, np.zeros(3, np.float32))
        for k in range(3):
            m.add_observation(k, f, p)
        pids.append(p)
    return cfg, m, lm, poses, pw, rng


def test_gba_apply_propagates_to_new_keyframes_and_points(small_ba_world):
    cfg, m, lm, poses, pw, rng = small_ba_world
    snap = lm.global_ba_snapshot()
    assert snap is not None
    prob, kfs, pts, fixed = snap

    # while the "solve" runs, a new keyframe (child of KF 2) and a new point
    # first-seen there appear
    T3 = np.eye(4, dtype=np.float32)
    T3[:3, 3] = [0.9, 0.0, 0.3]
    k3 = m.add_keyframe(T3, 3, 3.0, **_feats(rng, np.zeros((60, 2))))
    m.kf_parent[k3] = 2
    p_new = m.add_map_point(np.array([1.0, 1.0, 8.0], np.float32),
                            m.kf_feat_desc[k3, 0], k3, np.zeros(3, np.float32))
    m.add_observation(k3, 0, p_new)

    # fake BA result: shift every non-fixed camera and all points by +0.5 in x
    from orbslam2_nmi_tpu.solvers.local_ba import BAResult

    D = np.eye(4, dtype=np.float32)
    D[0, 3] = 0.5  # world-frame shift expressed as extra camera translation
    new_cams = np.asarray(prob.cam_Tcw).copy()
    for i in range(len(kfs)):
        if not fixed[i]:
            new_cams[i] = D @ new_cams[i]
    new_pts = np.asarray(prob.pts_w).copy()
    n_obs = len(np.asarray(prob.obs_cam))
    res = BAResult(
        cam_Tcw=new_cams, pts_w=new_pts,
        obs_inlier=np.ones(n_obs, bool), chi2=np.zeros(n_obs, np.float32),
    )
    T2_old = m.kf_Tcw[2].copy()
    lm.global_ba_apply(res, kfs, pts, fixed)

    # KF 3 must follow its parent: Tcw3_new = (T3 @ inv(T2_old)) @ T2_new
    expect = (T3 @ np.linalg.inv(T2_old)) @ m.kf_Tcw[2]
    np.testing.assert_allclose(m.kf_Tcw[k3], expect, atol=1e-5)
    # the new point must move with its reference keyframe's correction
    corr = np.linalg.inv(m.kf_Tcw[k3]) @ T3
    expect_p = (corr @ np.array([1.0, 1.0, 8.0, 1.0]))[:3]
    np.testing.assert_allclose(m.mp_pos[p_new], expect_p, atol=1e-5)


def test_gba_abort_discards_stale_result(small_ba_world):
    """A newer launch bumps the generation counter; the stale solve's result
    must not be applied (mnFullBAIdx semantics)."""
    cfg, m, lm, poses, pw, rng = small_ba_world

    class _Sys:
        pass

    from orbslam2_nmi_tpu.slam.pipeline import MappingPipeline

    sysm = _Sys()
    sysm.map = m
    sysm.local_mapper = lm
    sysm.loop_closer = None
    pipe = MappingPipeline(sysm)
    pose_before = m.kf_Tcw[2].copy()
    # launch, then immediately supersede: with the GIL both threads race, but
    # the second launch's generation always invalidates the... first's apply
    pipe.launch_global_ba(iters=4)
    pipe._gba_idx += 1  # simulate a newer loop closure arriving instantly
    pipe._gba_thread.join(60)
    np.testing.assert_allclose(m.kf_Tcw[2], pose_before, atol=1e-7)
    pipe.shutdown()


def test_async_loop_closure_does_not_stall_tracking():
    """End-to-end replay with async mapping: per-frame tracker latency must
    stay bounded even around keyframes that trigger mapping + loop checks
    (the round-1 inline GBA stalled the worker for the whole solve)."""
    from tests.test_slam_e2e import H, N_FRAMES, W, make_system
    from orbslam2_nmi_tpu.io.synthetic import SyntheticWorld

    world = SyntheticWorld.generate(seed=3)
    frames = [world.render_frame(i, N_FRAMES, W, H) for i in range(N_FRAMES)]
    sys_ = make_system(world)
    sys_.pipeline = None
    from orbslam2_nmi_tpu.slam.pipeline import MappingPipeline

    sys_.pipeline = MappingPipeline(sys_)
    sys_.set_init_poses(world.pose_at(0, N_FRAMES), world.pose_at(4, N_FRAMES))
    for i, img in enumerate(frames):
        sys_.track_monocular(img, i / 10.0)
    sys_.pipeline.flush(120)
    assert not sys_.pipeline.errors(), sys_.pipeline.errors()[0]
    # warm-up excluded (first frames compile); steady-state P95 bounded on CPU
    # (generous: CI machines run the whole suite concurrently — the failure
    # mode being guarded is the round-1 inline GBA's multi-second stall)
    ft = np.array(sys_.frame_times[8:])
    assert np.quantile(ft, 0.95) < 4.0, f"tracking stalled: P95 {np.quantile(ft, 0.95):.2f}s"
    sys_.shutdown()
