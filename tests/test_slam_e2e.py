"""End-to-end SLAM replay on a synthetic world with exact ground truth.

This is the analogue of the reference's dataset-replay evaluation
(SURVEY.md §4): mono tracking + local mapping on rendered frames, ATE-RMSE
bounded against the generating trajectory.
"""

import numpy as np
import pytest

from orbslam2_nmi_tpu.config import CameraConfig, NMIConfig, ORBConfig, SystemConfig, TrackingConfig
from orbslam2_nmi_tpu.io.synthetic import SyntheticWorld
from orbslam2_nmi_tpu.io.trajectory import ate_rmse
from orbslam2_nmi_tpu.slam.system import SLAMSystem
from orbslam2_nmi_tpu.slam.tracking import TrackingState

W, H = 320, 240
N_FRAMES = 25


@pytest.fixture(scope="module")
def world_and_frames():
    world = SyntheticWorld.generate(seed=3)
    frames = [world.render_frame(i, N_FRAMES, W, H) for i in range(N_FRAMES)]
    return world, frames


def make_system(world, use_nmi=False, async_nmi=False):
    K = world.camera_K(W, H)
    cfg = SystemConfig(
        camera=CameraConfig(
            fx=float(K[0, 0]), fy=float(K[1, 1]), cx=float(K[0, 2]), cy=float(K[1, 2]),
            width=W, height=H, fps=10.0,
        ),
        orb=ORBConfig(n_features=400, n_levels=4),
        nmi=NMIConfig(offset=4, threshold=0.3),
        tracking=TrackingConfig(
            max_frames=10, max_keyframes=64, max_map_points=8192, max_features=512
        ),
    )
    model = None
    if use_nmi:
        import jax.numpy as jnp

        from orbslam2_nmi_tpu.ops import render as render_ops

        model = render_ops.RenderModel(
            points=jnp.asarray(world.points), gray=jnp.asarray(world.gray)
        )
        cfg = cfg.replace(
            nmi=NMIConfig(
                offset=4, threshold=0.3, render_near=2.0, render_far=40.0,
                max_iteration_count=2,
            )
        )
    import tempfile

    return SLAMSystem(
        cfg, nmi_model=model, use_nmi=use_nmi, output_dir=tempfile.mkdtemp(),
        async_nmi=async_nmi,
    )


def test_vo_pipeline_tracks_sequence(world_and_frames):
    world, frames = world_and_frames
    sys_ = make_system(world, use_nmi=False)
    sys_.set_init_poses(world.pose_at(0, N_FRAMES), world.pose_at(4, N_FRAMES))

    est, gt = [], []
    n_ok = 0
    for i, img in enumerate(frames):
        res = sys_.track_monocular(img, i / 10.0)
        if res.state == TrackingState.OK and res.Tcw is not None:
            n_ok += 1
            est.append(res.Tcw)
            gt.append(world.pose_at(i, N_FRAMES))
    assert n_ok >= N_FRAMES - 6, f"only {n_ok} frames tracked"
    assert sys_.map.n_keyframes >= 3
    assert len(sys_.map.valid_point_indices()) > 100

    err = ate_rmse(est, gt, align=False)  # poses are in the GT frame (anchored init)
    assert err < 0.5, f"ATE {err:.3f} m over a 12 m path"
    sys_.shutdown()


def test_outputs_reference_format(world_and_frames, tmp_path):
    world, frames = world_and_frames
    sys_ = make_system(world, use_nmi=False)
    sys_.output_dir = str(tmp_path)
    sys_.set_init_poses(world.pose_at(0, N_FRAMES), world.pose_at(4, N_FRAMES))
    for i, img in enumerate(frames[:12]):
        sys_.track_monocular(img, i / 10.0)
    sys_.save_full_trajectory("Full")
    sys_.save_keyframe_trajectory_tum("KF.txt")
    sys_.print_map_points("Map.xyz")

    full = (tmp_path / "Full.txt").read_text().strip().splitlines()
    assert len(full) >= 5
    # rows: id t [flags] x y z qx qy qz qw
    kf_rows = [l for l in full if " KF" in l]
    assert len(kf_rows) >= 2
    first = full[0].split()
    assert len(first) >= 9
    kf = (tmp_path / "KF.txt").read_text().strip().splitlines()
    assert all(len(l.split()) == 8 for l in kf)
    xyz = np.loadtxt(tmp_path / "Map.xyz")
    assert xyz.shape[1] == 3 and len(xyz) > 50


def test_async_pipeline_tracks_sequence(world_and_frames):
    """Same sequence through the asynchronous mapping worker (the reference's
    LocalMapping/LoopClosing thread layout): tracking must stay healthy, the
    worker must drain cleanly, and accuracy must stay in the same band."""
    world, frames = world_and_frames
    K = world.camera_K(W, H)
    cfg = SystemConfig(
        camera=CameraConfig(
            fx=float(K[0, 0]), fy=float(K[1, 1]), cx=float(K[0, 2]), cy=float(K[1, 2]),
            width=W, height=H, fps=10.0,
        ),
        orb=ORBConfig(n_features=400, n_levels=4),
        nmi=NMIConfig(offset=4, threshold=0.3),
        tracking=TrackingConfig(
            max_frames=10, max_keyframes=64, max_map_points=8192, max_features=512
        ),
    )
    import tempfile

    sys_ = SLAMSystem(cfg, use_nmi=False, output_dir=tempfile.mkdtemp(),
                      async_mapping=True)
    assert sys_.pipeline is not None
    sys_.set_init_poses(world.pose_at(0, N_FRAMES), world.pose_at(4, N_FRAMES))

    est, gt = [], []
    n_ok = 0
    for i, img in enumerate(frames):
        res = sys_.track_monocular(img, i / 10.0)
        if res.state == TrackingState.OK and res.Tcw is not None:
            n_ok += 1
            est.append(res.Tcw)
            gt.append(world.pose_at(i, N_FRAMES))
    assert sys_.pipeline.flush(timeout=120.0), "mapping worker failed to drain"
    assert sys_.pipeline.errors() == []
    assert n_ok >= N_FRAMES - 8, f"only {n_ok} frames tracked"
    assert sys_.map.n_keyframes >= 3
    err = ate_rmse(est, gt, align=False)
    assert err < 0.8, f"async ATE {err:.3f} m"
    sys_.shutdown()


def test_localization_only_mode(world_and_frames):
    """System::ActivateLocalizationMode (System.cc:298-310) + the
    mbOnlyTracking/mbVO branch of Track (Tracking.cc:402-530): build a map,
    freeze it, track a second pass with ZERO map growth, survive an induced
    loss via relocalization, then resume full SLAM."""
    world, frames = world_and_frames
    sys_ = make_system(world, use_nmi=False)
    sys_.set_init_poses(world.pose_at(0, N_FRAMES), world.pose_at(4, N_FRAMES))
    for i, img in enumerate(frames):
        sys_.track_monocular(img, i / 10.0)
    assert sys_.map.n_keyframes >= 3

    sys_.activate_localization_mode()
    n_kf = int(sys_.map.n_keyframes)
    n_mp = len(sys_.map.valid_point_indices())

    # second pass over the same path: must track against the frozen map
    est, gt = [], []
    n_ok = 0
    for i, img in enumerate(frames):
        res = sys_.track_monocular(img, (N_FRAMES + i) / 10.0, frame_id=N_FRAMES + i)
        if res.state == TrackingState.OK and res.Tcw is not None:
            n_ok += 1
            est.append(res.Tcw)
            gt.append(world.pose_at(i, N_FRAMES))
    assert n_ok >= N_FRAMES - 8, f"only {n_ok}/{N_FRAMES} frames in loc-only mode"
    assert int(sys_.map.n_keyframes) == n_kf, "map grew in localization mode"
    assert len(sys_.map.valid_point_indices()) == n_mp, "points grew in loc mode"
    err = ate_rmse(est, gt, align=False)
    assert err < 0.8, f"loc-only ATE {err:.3f} m"

    # induced loss: garbage frames, then recovery on real imagery
    rng = np.random.default_rng(0)
    fid = 2 * N_FRAMES
    for j in range(3):
        noise = rng.integers(0, 255, frames[0].shape).astype(np.uint8)
        res = sys_.track_monocular(noise, (fid + j) / 10.0, frame_id=fid + j)
    assert sys_.tracker.state == TrackingState.LOST
    recovered = False
    for j in range(6):
        res = sys_.track_monocular(
            frames[6 + j], (fid + 3 + j) / 10.0, frame_id=fid + 3 + j
        )
        if res.state == TrackingState.OK:
            recovered = True
            break
    assert recovered, "relocalization failed after induced loss in loc-only mode"
    assert int(sys_.map.n_keyframes) == n_kf

    # resume full SLAM: keyframe creation allowed again
    sys_.deactivate_localization_mode()
    assert sys_.tracker.only_tracking is False
    sys_.shutdown()
