"""Tracking front-end: per-frame pose estimation, keyframe policy, NMI triggers.

The TPU-native equivalent of src/Tracking.cc (2,459 LoC in the reference).
Host Python orchestrates; every numeric stage is a jitted device call:
ORB extraction, windowed matching, pose-only LM, NMI grid search.

Pipeline parity (Tracking::Track, reference src/Tracking.cc:356-692):
  NOT_INITIALIZED -> InitializeWithNMI at frame 0 and frame NMI.Offset
                     (Tracking.cc:2181-2372; poses may also be supplied
                     directly for model-free runs/tests)
  OK  -> TrackWithMotionModel (:1083) -> TrackReferenceKeyFrame fallback (:950)
      -> TrackLocalMap (:1172) -> NeedNewKeyFrame/CreateNewKeyFrame (:1217,:1313)
      -> NMI relocalization every `reloc_frequency`-th keyframe (:598-623)
  LOST -> reset if <= 5 KFs (:637-643)

Drift accumulators mirror Tracking.cc:648-662: per-axis |delta| of camera
translation and Euler angles accumulated per frame, reset per-axis after a
successful NMI relocalization of a searched axis (:600-612).
"""

from __future__ import annotations

from dataclasses import dataclass
from enum import Enum
from typing import Callable, Optional

import jax.numpy as jnp
import numpy as np

from orbslam2_nmi_tpu.config import SystemConfig
from orbslam2_nmi_tpu.geometry import camera as cam_geo
from orbslam2_nmi_tpu.geometry import se3
from orbslam2_nmi_tpu.ops import matching, triangulate
from orbslam2_nmi_tpu.ops.orb import extract_orb
from orbslam2_nmi_tpu.slam.frame import FrameData
from orbslam2_nmi_tpu.slam.map_store import MapStore
from orbslam2_nmi_tpu.utils.bucketing import bucket, pad_rows, row_mask
from orbslam2_nmi_tpu.solvers import pose_gn


class TrackingState(Enum):
    NOT_INITIALIZED = 0
    OK = 1
    LOST = 2


@dataclass
class TrackResult:
    state: TrackingState
    Tcw: Optional[np.ndarray]
    n_inliers: int
    is_keyframe: bool
    nmi_relocalized: bool = False
    nmi_score: float = 0.0


def euler_zyx_angles(R: np.ndarray) -> np.ndarray:
    """Euler angles as used by the drift accumulator
    (rotationMatrixToEulerAngles, Tracking.cc:655)."""
    sy = np.sqrt(R[0, 0] ** 2 + R[1, 0] ** 2)
    if sy > 1e-6:
        return np.array(
            [np.arctan2(R[2, 1], R[2, 2]), np.arctan2(-R[2, 0], sy), np.arctan2(R[1, 0], R[0, 0])]
        )
    return np.array([np.arctan2(-R[1, 2], R[1, 1]), np.arctan2(-R[2, 0], sy), 0.0])


class Tracker:
    def __init__(
        self,
        cfg: SystemConfig,
        map_store: MapStore,
        local_mapper=None,
        nmi_localizer=None,
        log_fn: Optional[Callable[[str], None]] = None,
        system=None,
    ):
        self.cfg = cfg
        self.map = map_store
        self.local_mapper = local_mapper
        self.nmi = nmi_localizer
        self.system = system  # for vocabulary / database / loop closer access
        self.log = log_fn or (lambda s: None)
        self._rng_key = None  # lazily split for PnP RANSAC

        self.state = TrackingState.NOT_INITIALIZED
        self.velocity: Optional[np.ndarray] = None  # Tcw_cur @ inv(Tcw_last)
        self.last_frame: Optional[FrameData] = None
        self.init_frame: Optional[FrameData] = None
        self.ref_kf: int = -1
        self.last_kf_frame_id: int = -1
        self.kfs_since_last_nmi: int = 0
        self.dist_since_nmi = np.zeros(3)
        self.rot_since_nmi = np.zeros(3)
        # consecutive failed NMI relocalizations: each failure widens the
        # next search window (the 2%-of-motion step sizing, Tracking.cc:2003,
        # assumes ~1% drift — when real drift exceeds the +-1-step span the
        # grid can never re-capture the pose and failures cascade; widening
        # on failure is a pure extension that restores capture)
        self.nmi_fail_streak: int = 0
        # consecutive NMI-due keyframes skipped because the async worker was
        # busy: at >=2 the frame loop applies BACKPRESSURE (waits for the
        # in-flight sweep before proceeding) — when the tracker outruns the
        # sweep latency, anchors land too sparsely and drift escapes the
        # search window. The reference stalls for EVERY sweep; a bounded
        # occasional stall is strictly better while guaranteeing cadence.
        self.nmi_due_skips: int = 0
        self.n_resets: int = 0
        # localization-only mode (System::ActivateLocalizationMode,
        # System.cc:298-310): map frozen, no keyframes/mapping; vo_mode is
        # the reference's mbVO flag — last frame held <10 map inliers, so the
        # local map is unusable until relocalization re-attaches
        # (Tracking.cc:402-530, :1163-1165)
        self.only_tracking: bool = False
        self.vo_mode: bool = False
        # last OK-tracked pose; survives reset() — seeds NMI re-initialization
        self._last_good_Tcw: Optional[np.ndarray] = None
        self._reinit_fails: int = 0
        # relative-pose rows (frame_id, t, Tcr, ref_kf, lost, previous_poses)
        # — mlRelativeFramePoses et al. (Tracking.cc:667-691); absolute poses
        # are recomposed at save time (io.trajectory.recompose_trajectory)
        self.trajectory: list = []
        self._gray: Optional[np.ndarray] = None

        # per-octave information weights: invSigma2 = 1/scale^2 (Frame.cc)
        n_lv = cfg.orb.n_levels
        sf = cfg.orb.scale_factor
        self.inv_sigma2 = (1.0 / (sf ** np.arange(n_lv)) ** 2).astype(np.float32)
        self.K = cfg.camera.K
        self.dist_coeffs = np.array(
            [cfg.camera.k1, cfg.camera.k2, cfg.camera.p1, cfg.camera.p2, cfg.camera.k3],
            np.float32,
        )
        # init poses (NMI.Init1/Init2 are Twc matrices in the yaml)
        self._init_T1: Optional[np.ndarray] = None
        self._init_T2: Optional[np.ndarray] = None
        if cfg.nmi.init1 is not None:
            self._init_T1 = np.linalg.inv(cfg.nmi.init1.astype(np.float32))
        if cfg.nmi.init2 is not None:
            self._init_T2 = np.linalg.inv(cfg.nmi.init2.astype(np.float32))

    def set_init_poses(self, Tcw1: np.ndarray, Tcw2: np.ndarray):
        """Supply init poses directly (tests / model-free runs)."""
        self._init_T1 = Tcw1.astype(np.float32)
        self._init_T2 = Tcw2.astype(np.float32)

    # ------------------------------------------------------------ per frame

    def process_frame(self, frame_id: int, timestamp: float, gray_u8: np.ndarray) -> TrackResult:
        # NMI backpressure (see nmi_due_skips) — MUST run outside the map
        # lock: the worker's apply phase takes it from its own thread
        worker = getattr(self.system, "nmi_worker", None) if self.system else None
        if worker is not None and self.nmi_due_skips >= 2 and worker.busy():
            worker.flush(timeout=600.0)
            self.nmi_due_skips = 0
        # feature extraction runs outside the map lock (Frame construction
        # precedes the Tracking.cc:377 mutex in the reference)
        self._gray = gray_u8
        frame = self._make_frame(frame_id, timestamp, gray_u8)
        with self.map.lock:
            return self._process_tracked_frame(frame_id, timestamp, frame)

    def _process_tracked_frame(self, frame_id, timestamp, frame) -> TrackResult:
        if self.state == TrackingState.NOT_INITIALIZED:
            res = self._initialize(frame)
        else:
            res = self._track(frame)
            # reset if lost soon after initialization (Tracking.cc:637-643)
            if res.state == TrackingState.LOST and self.map.n_keyframes <= 5:
                self.log("track lost soon after initialization, resetting")
                self.reset()

        self.record_frame(frame_id, timestamp, frame)
        return res

    def record_frame(self, frame_id: int, timestamp: float, frame: FrameData):
        """Per-frame bookkeeping shared by the classic and fused front-ends:
        drift accumulators (Tracking.cc:648-662) and the relative-pose
        trajectory row (Tracking.cc:667-691). Sets `last_frame`."""
        if (
            frame.Tcw is not None
            and self.last_frame is not None
            and self.last_frame.Tcw is not None
            # only OK-tracked poses feed the accumulators (the reference
            # updates them inside the tracking-OK branch, Tracking.cc:648-662;
            # a diverged/LOST frame's pose here would poison the NMI kernel
            # sizing and — via a NaN distance — the adaptive accept threshold)
            and self.state == TrackingState.OK
            and np.isfinite(frame.Tcw).all()
            and np.isfinite(self.last_frame.Tcw).all()
        ):
            dT = np.abs(frame.Tcw[:3, 3] - self.last_frame.Tcw[:3, 3])
            self.dist_since_nmi += dT
            dR = np.abs(
                euler_zyx_angles(frame.Tcw[:3, :3]) - euler_zyx_angles(self.last_frame.Tcw[:3, :3])
            )
            self.rot_since_nmi += dR
            self._last_good_Tcw = frame.Tcw.copy()

        # store pose RELATIVE to the reference keyframe (Tracking.cc:667-691):
        # Tcr = Tcw * Twr, snapped to identity when the frame IS the keyframe
        # (sum-abs < 0.01, Tracking.cc:677-683). Recomposition at save time
        # lets loop/GBA/NMI corrections reach the saved trajectory.
        if frame.Tcw is not None and self.ref_kf >= 0:
            Tcr = frame.Tcw @ np.linalg.inv(self.map.kf_Tcw[self.ref_kf])
            if float(np.abs(Tcr - np.eye(4)).sum()) < 0.01:
                Tcr = np.eye(4, dtype=np.float32)
            frame.ref_kf = self.ref_kf
            frame.Tcr = Tcr.astype(np.float32)
            self.trajectory.append(
                (frame_id, timestamp, frame.Tcr, frame.ref_kf, False,
                 [p.copy() for p in frame.previous_poses])
            )
        elif self.trajectory:
            # tracking lost: replicate the last row flagged lost (Tracking.cc:688-691)
            last = self.trajectory[-1]
            self.trajectory.append((frame_id, timestamp, last[2], last[3], True, []))
        self.last_frame = frame

    def _make_frame(self, frame_id: int, timestamp: float, gray_u8: np.ndarray) -> FrameData:
        feats = extract_orb(jnp.asarray(gray_u8), self.cfg.orb)
        xy_raw = np.asarray(feats.xy)
        if self.cfg.camera.has_distortion:
            xy = np.asarray(
                cam_geo.undistort_points(
                    jnp.asarray(self.K), jnp.asarray(self.dist_coeffs), feats.xy
                )
            )
        else:
            xy = xy_raw
        return FrameData(
            frame_id=frame_id,
            timestamp=timestamp,
            Tcw=None,
            xy=xy,
            xy_raw=xy_raw,
            octave=np.asarray(feats.octave),
            angle=np.asarray(feats.angle),
            desc=np.asarray(feats.desc),
            valid=np.asarray(feats.valid),
        )

    # ---------------------------------------------------------- initialization

    def _initialize(self, frame: FrameData) -> TrackResult:
        """InitializeWithNMI (Tracking.cc:2181-2372): pose frame 0 and frame
        `offset` from NMI (or supplied poses), match, triangulate, global BA
        with both KFs NMI-fixed => metric georeferenced scale.

        Re-initialization after a System::Reset: the reference cannot recover
        mid-sequence (its init runs only at the hand-configured frame ids;
        the pt2/pt3/pt4 YAMLs restart the process with fresh init poses,
        ETH_small_pt2.yaml:62-75). Here the automated equivalent: seed the
        init hypotheses from the last well-tracked pose and REQUIRE the NMI
        latch to clear the accept threshold — a failed latch retries on later
        frames instead of anchoring a garbage map."""
        cfg = self.cfg.nmi
        # without an NMI localizer there is nothing to latch against — fall
        # back to classic two-view re-initialization (model-free operation)
        reinit = self.n_resets > 0 and self.nmi is not None
        if frame.frame_id == 0 or self.init_frame is None:
            if self._init_T1 is None or (self.n_resets > 0 and self.nmi is None):
                # classic monocular init path: just remember the first frame
                frame.Tcw = np.eye(4, dtype=np.float32)
                self.init_frame = frame
                return TrackResult(self.state, frame.Tcw, 0, False)
            if reinit:
                if self._last_good_Tcw is None:
                    return TrackResult(self.state, None, 0, False)
                frame.Tcw = self._last_good_Tcw.copy()
                # the camera keeps moving while we are down: widen the search
                # span with every failed latch so the true pose re-enters the
                # grid (pure extension — the reference has no re-init at all);
                # passed per-call, never latched into localizer state
                ok = self._run_nmi(
                    frame, initializing=True,
                    search_scale=1.0 + 0.5 * min(self._reinit_fails, 8),
                )
                if not ok:
                    self._reinit_fails += 1
                    self.log(
                        f"frame {frame.frame_id}: re-init NMI latch failed "
                        f"({self._reinit_fails}), retrying wider"
                    )
                    return TrackResult(self.state, None, 0, False)
                self._reinit_fails = 0
            else:
                frame.Tcw = self._init_T1.copy()
                self._run_nmi(frame, initializing=True)
            self.init_frame = frame
            return TrackResult(self.state, frame.Tcw, 0, False)

        if self._init_T1 is None or (self.n_resets > 0 and self.nmi is None):
            return self._initialize_classic(frame)

        if frame.frame_id < self.init_frame.frame_id + cfg.offset:
            return TrackResult(self.state, None, 0, False)

        if reinit:
            # second latch seeded from the first's NMI-refined pose
            frame.Tcw = self.init_frame.Tcw.copy()
            if not self._run_nmi(frame, initializing=True):
                self.log(
                    f"frame {frame.frame_id}: re-init second NMI latch failed, retrying"
                )
                self.init_frame = None
                return TrackResult(self.state, None, 0, False)
        else:
            frame.Tcw = (self._init_T2 if self._init_T2 is not None else self._init_T1).copy()
            self._run_nmi(frame, initializing=True)

        f1, f2 = self.init_frame, frame
        idx, dist = matching.match_descriptors(
            jnp.asarray(f1.desc),
            jnp.asarray(f1.valid),
            jnp.asarray(f2.desc),
            jnp.asarray(f2.valid),
            max_dist=matching.TH_LOW,
            nn_ratio=0.9,
            angle_a=jnp.asarray(f1.angle),
            angle_b=jnp.asarray(f2.angle),
            check_rotation=True,
        )
        idx = np.asarray(idx)
        m1 = np.nonzero(idx >= 0)[0]
        m2 = idx[m1]
        if len(m1) < 20:
            self.log(f"init: only {len(m1)} matches, retrying with next frame pair")
            self.init_frame = None
            return TrackResult(self.state, frame.Tcw, 0, False)

        nb = bucket(len(m1))
        tri = triangulate.triangulate_and_gate(
            jnp.asarray(self.K),
            jnp.asarray(f1.Tcw),
            jnp.asarray(f2.Tcw),
            jnp.asarray(pad_rows(f1.xy[m1], nb)),
            jnp.asarray(pad_rows(f2.xy[m2], nb)),
            jnp.asarray(pad_rows(self.inv_sigma2[f1.octave[m1]], nb, 1.0)),
            jnp.asarray(pad_rows(self.inv_sigma2[f2.octave[m2]], nb, 1.0)),
            jnp.asarray(row_mask(len(m1), nb)),
        )
        ok = np.asarray(tri.valid)[: len(m1)]
        pts = np.asarray(tri.points_w)[: len(m1)]
        if ok.sum() < 15:
            self.log(f"init: only {int(ok.sum())} triangulated, aborting this pair")
            self.init_frame = None
            return TrackResult(self.state, frame.Tcw, 0, False)

        # create the two NMI-anchored keyframes + map points
        k1 = self.map.add_keyframe(
            f1.Tcw, f1.frame_id, f1.timestamp, f1.xy, f1.octave, f1.angle, f1.desc,
            f1.valid, nmi_relocalized=True,
        )
        k2 = self.map.add_keyframe(
            f2.Tcw, f2.frame_id, f2.timestamp, f2.xy, f2.octave, f2.angle, f2.desc,
            f2.valid, nmi_relocalized=frame.nmi_relocalized or self.nmi is None,
        )
        for i in np.nonzero(ok)[0]:
            fa, fb = int(m1[i]), int(m2[i])
            p = self.map.add_map_point(
                pts[i], f1.desc[fa], k1, np.zeros(3, np.float32)
            )
            self.map.add_observation(k1, fa, p)
            self.map.add_observation(k2, fb, p)
            self.map.update_point_stats(
                p, self.K, self.cfg.orb.scale_factor, self.cfg.orb.n_levels
            )
            frame.mp_idx[fb] = p

        # global BA on the initial map (20 iters, both KFs fixed via NMI flag)
        if self.local_mapper is not None:
            self.local_mapper.global_ba(iters=20)
            frame.Tcw = self.map.kf_Tcw[k2].copy()

        self.ref_kf = k2
        self.last_kf_frame_id = frame.frame_id
        self.state = TrackingState.OK
        self.log(
            f"NMI initialization: {int(ok.sum())} map points from frames "
            f"{f1.frame_id}/{f2.frame_id}"
        )
        return TrackResult(self.state, frame.Tcw, int(ok.sum()), True)

    def _initialize_classic(self, frame: FrameData) -> TrackResult:
        """Stock monocular initialization (MonocularInitialization,
        Tracking.cc:755 + CreateInitialMapMonocular :882): two-view H/F RANSAC
        reconstruction, map rescaled to unit median depth. The reference
        bypasses this in favor of NMI init; it serves model-free operation."""
        import jax

        from orbslam2_nmi_tpu.solvers import two_view_init

        f1 = self.init_frame
        idx, _ = matching.match_descriptors(
            jnp.asarray(f1.desc), jnp.asarray(f1.valid),
            jnp.asarray(frame.desc), jnp.asarray(frame.valid),
            spatial_mask=matching.window_mask(
                jnp.asarray(f1.xy), jnp.asarray(frame.xy), 100.0
            ),
            max_dist=matching.TH_LOW, nn_ratio=0.9,
            angle_a=jnp.asarray(f1.angle), angle_b=jnp.asarray(frame.angle),
            check_rotation=True,
        )
        idx = np.asarray(idx)
        m1 = np.nonzero(idx >= 0)[0]
        if len(m1) < 100:
            if frame.frame_id - f1.frame_id > 20:
                self.init_frame = frame  # restart with a fresh reference
                frame.Tcw = np.eye(4, dtype=np.float32)
            return TrackResult(self.state, None, 0, False)
        m2 = idx[m1]
        if self._rng_key is None:
            self._rng_key = jax.random.PRNGKey(13)
        self._rng_key, sub = jax.random.split(self._rng_key)
        nb = bucket(len(m1))
        res = two_view_init.initialize_two_view(
            sub, jnp.asarray(self.K),
            jnp.asarray(pad_rows(f1.xy[m1], nb)),
            jnp.asarray(pad_rows(frame.xy[m2], nb)),
            jnp.asarray(row_mask(len(m1), nb)),
        )
        if not bool(res.ok):
            return TrackResult(self.state, None, 0, False)
        inl = np.asarray(res.inliers)[: len(m1)]
        pts = np.asarray(res.points_w)[: len(m1)]
        T2 = np.asarray(res.Tcw2)
        # normalize to unit median depth (CreateInitialMapMonocular :896)
        med = float(np.median(pts[inl][:, 2]))
        if med <= 0:
            return TrackResult(self.state, None, 0, False)
        pts = pts / med
        T2 = T2.copy()
        T2[:3, 3] /= med

        f1.Tcw = np.eye(4, dtype=np.float32)
        frame.Tcw = T2.astype(np.float32)
        k1 = self.map.add_keyframe(
            f1.Tcw, f1.frame_id, f1.timestamp, f1.xy, f1.octave, f1.angle, f1.desc, f1.valid
        )
        k2 = self.map.add_keyframe(
            frame.Tcw, frame.frame_id, frame.timestamp, frame.xy, frame.octave,
            frame.angle, frame.desc, frame.valid,
        )
        for i in np.nonzero(inl)[0]:
            fa, fb = int(m1[i]), int(m2[i])
            p = self.map.add_map_point(pts[i], f1.desc[fa], k1, np.zeros(3, np.float32))
            self.map.add_observation(k1, fa, p)
            self.map.add_observation(k2, fb, p)
            self.map.update_point_stats(p, self.K, self.cfg.orb.scale_factor, self.cfg.orb.n_levels)
            frame.mp_idx[fb] = p
        if self.local_mapper is not None:
            self.local_mapper.global_ba(iters=20)
            frame.Tcw = self.map.kf_Tcw[k2].copy()
        self.ref_kf = k2
        self.last_kf_frame_id = frame.frame_id
        self.state = TrackingState.OK
        self.log(
            f"classic initialization: {int(inl.sum())} points, "
            f"{'H' if bool(res.used_homography) else 'F'} model"
        )
        return TrackResult(self.state, frame.Tcw, int(inl.sum()), True)

    # ---------------------------------------------------------------- track

    def _track(self, frame: FrameData) -> TrackResult:
        if self.only_tracking:
            return self._track_localization_only(frame)
        t = self.cfg.tracking
        ok = False
        if self.state == TrackingState.LOST:
            ok = self._relocalize(frame)
            if ok:
                self.state = TrackingState.OK
                self.velocity = None
        else:
            if self.velocity is not None and self.last_frame is not None:
                ok = self._track_with_motion_model(frame)
            if not ok:
                ok = self._track_reference_keyframe(frame)

        if not ok:
            self.state = TrackingState.LOST
            self.log(f"frame {frame.frame_id}: tracking LOST")
            return TrackResult(self.state, None, 0, False)

        n_inliers = self._track_local_map(frame)
        if n_inliers < 10:
            self.state = TrackingState.LOST
            self.log(f"frame {frame.frame_id}: local map tracking failed ({n_inliers})")
            return TrackResult(self.state, None, n_inliers, False)

        # velocity model update
        if self.last_frame is not None and self.last_frame.Tcw is not None:
            self.velocity = frame.Tcw @ np.linalg.inv(self.last_frame.Tcw)

        is_kf = False
        nmi_reloc = False
        if self._need_new_keyframe(frame, n_inliers):
            # NMI relocalization every reloc_frequency-th KF (Tracking.cc:598-623)
            nmi_due = (
                self.nmi is not None
                and self.kfs_since_last_nmi + 1 == self.cfg.nmi.reloc_frequency
            )
            worker = getattr(self.system, "nmi_worker", None) if self.system else None
            if nmi_due and worker is None:
                nmi_reloc = self._run_nmi(frame, initializing=False)
            self._create_keyframe(frame)
            is_kf = True
            attempted = True
            if nmi_due and worker is not None:
                # async: sweep runs off-thread, anchor lands on the KF later
                attempted = self._submit_async_nmi(frame)
            if nmi_due and not attempted:
                self.nmi_due_skips += 1  # busy: counter stays due, next KF retries
            else:
                if nmi_due:
                    self.nmi_due_skips = 0
                self.kfs_since_last_nmi += 1
                if self.kfs_since_last_nmi >= self.cfg.nmi.reloc_frequency:
                    self.kfs_since_last_nmi = 0

        # drop outlier bindings so the next frame doesn't use them (Tracking.cc:627)
        frame.mp_idx[frame.outlier] = -1
        frame.outlier[:] = False

        return TrackResult(self.state, frame.Tcw, n_inliers, is_kf, nmi_reloc)

    def _track_localization_only(self, frame: FrameData) -> TrackResult:
        """The mbOnlyTracking branch of Track (Tracking.cc:475-530, :546-552):
        map frozen, no keyframes. In vo_mode (mbVO — last frame held <10 map
        inliers) the pose comes from motion-model tracking AND relocalization
        computed side by side, preferring a successful relocalization (which
        re-attaches the local map and clears vo_mode)."""
        ok = False
        if self.state == TrackingState.LOST:
            ok = self._relocalize(frame)
            if ok:
                self.state = TrackingState.OK
                self.velocity = None
        elif not self.vo_mode:
            if self.velocity is not None and self.last_frame is not None:
                ok = self._track_with_motion_model(frame)
            if not ok:
                ok = self._track_reference_keyframe(frame)
        else:
            # mbVO: two candidate poses (Tracking.cc:487-530)
            ok_mm = False
            mm_state = None
            if self.velocity is not None and self.last_frame is not None:
                ok_mm = self._track_with_motion_model(frame)
                if ok_mm:
                    mm_state = (
                        frame.Tcw.copy(), frame.mp_idx.copy(), frame.outlier.copy()
                    )
            ok_reloc = self._relocalize(frame)
            if ok_mm and not ok_reloc:
                frame.Tcw, frame.mp_idx, frame.outlier = mm_state
            elif ok_reloc:
                self.vo_mode = False  # Tracking.cc:518
            ok = ok_mm or ok_reloc

        n_inliers = 0
        if ok and not self.vo_mode:
            # Tracking.cc:551: no TrackLocalMap while mbVO — the local map
            # cannot be retrieved until the system relocalizes
            n_inliers = self._track_local_map(frame)
            ok = n_inliers >= 10

        if not ok:
            self.state = TrackingState.LOST
            self.log(f"frame {frame.frame_id}: tracking LOST (localization-only)")
            return TrackResult(self.state, None, 0, False)

        self.state = TrackingState.OK
        if self.last_frame is not None and self.last_frame.Tcw is not None:
            self.velocity = frame.Tcw @ np.linalg.inv(self.last_frame.Tcw)
        # no NeedNewKeyFrame / CreateNewKeyFrame: the map stays frozen
        frame.mp_idx[frame.outlier] = -1
        frame.outlier[:] = False
        return TrackResult(self.state, frame.Tcw, n_inliers, False)

    def _pose_optimize(self, frame: FrameData) -> int:
        bound = frame.mp_idx >= 0
        idxs = np.nonzero(bound)[0]
        if len(idxs) < 3:
            return 0
        pts = self.map.mp_pos[frame.mp_idx[idxs]]
        nb = bucket(len(idxs))
        res = pose_gn.pose_optimization_jit(
            jnp.asarray(self.K),
            jnp.asarray(frame.Tcw),
            jnp.asarray(pad_rows(pts, nb)),
            jnp.asarray(pad_rows(frame.xy[idxs], nb)),
            jnp.asarray(pad_rows(self.inv_sigma2[frame.octave[idxs]], nb, 1.0)),
            jnp.asarray(row_mask(len(idxs), nb)),
            rounds=self.cfg.tracking.pose_opt_rounds,
            iters=self.cfg.tracking.pose_opt_iters,
        )
        frame.Tcw = np.asarray(res.Tcw)
        inl = np.asarray(res.inliers)[: len(idxs)]
        frame.outlier[idxs] = ~inl
        return int(res.n_inliers)

    def _track_with_motion_model(self, frame: FrameData) -> bool:
        """Tracking.cc:1083: project last frame's points at the predicted pose,
        windowed search th=15 (doubled on failure), then pose-only LM."""
        last = self.last_frame
        self._update_last_frame(last)
        frame.Tcw = self.velocity @ last.Tcw
        bound = last.mp_idx >= 0
        if bound.sum() < 10:
            return False
        mp_ids = last.mp_idx[bound]
        pts = self.map.mp_pos[mp_ids]

        n_src = int(bound.sum())
        nb = bucket(n_src)
        for th in (15.0, 30.0):
            proj = self._project(frame.Tcw, pts)
            radius = th * self.cfg.orb.scale_factor ** last.octave[bound].astype(np.float32)
            sm = matching.window_mask(
                jnp.asarray(pad_rows(proj, nb)),
                jnp.asarray(frame.xy),
                jnp.asarray(pad_rows(radius, nb)),
                jnp.asarray(pad_rows(last.octave[bound], nb)),
                jnp.asarray(frame.octave),
                level_window=1,
            )
            idx, _ = matching.match_descriptors(
                jnp.asarray(pad_rows(last.desc[bound], nb)),
                jnp.asarray(row_mask(n_src, nb)),
                jnp.asarray(frame.desc),
                jnp.asarray(frame.valid),
                spatial_mask=sm,
                max_dist=matching.TH_HIGH,
                apply_ratio=False,
                angle_a=jnp.asarray(pad_rows(last.angle[bound], nb)),
                angle_b=jnp.asarray(frame.angle),
                check_rotation=True,
            )
            idx = np.asarray(idx)[:n_src]
            n_matches = (idx >= 0).sum()
            if n_matches >= 20:
                break
        if n_matches < 20:
            return False

        frame.mp_idx[:] = -1
        src = np.nonzero(idx >= 0)[0]
        frame.mp_idx[idx[src]] = mp_ids[src]
        n_in = self._pose_optimize(frame)
        self.log(f"frame {frame.frame_id}: motion model {n_matches} matches, {n_in} inliers")
        if self.only_tracking:
            # Tracking.cc:1163-1165: <10 map inliers switches to VO mode but
            # the frame still counts as tracked on >20 descriptor matches
            self.vo_mode = n_in < 10
            return n_matches > 20
        return n_in >= 10

    def _update_last_frame(self, last: FrameData):
        """UpdateLastFrame (Tracking.cc:1020): re-anchor the last frame's pose
        from its reference keyframe (`Tlr * Tcw_ref`) so BA / loop / NMI
        refinements of the keyframe reach the motion model."""
        if last.Tcr is None or last.ref_kf < 0:
            return
        Trw = np.eye(4, dtype=np.float32)
        k = int(last.ref_kf)
        while k >= 0 and not self.map.kf_valid[k]:
            Trw = Trw @ self.map.kf_Tcp[k]
            k = int(self.map.kf_parent[k])
        if k < 0:
            return
        last.Tcw = (last.Tcr @ Trw @ self.map.kf_Tcw[k]).astype(np.float32)

    def _track_reference_keyframe(self, frame: FrameData) -> bool:
        """Tracking.cc:950: descriptor match against the reference KF's
        map-point features (BoW-accelerated there, dense here) + pose LM."""
        if self.ref_kf < 0:
            return False
        k = self.ref_kf
        has_mp = self.map.kf_mp_idx[k] >= 0
        if has_mp.sum() < 10:
            return False
        idx, _ = matching.match_descriptors(
            jnp.asarray(self.map.kf_feat_desc[k]),
            jnp.asarray(has_mp),
            jnp.asarray(frame.desc),
            jnp.asarray(frame.valid),
            max_dist=matching.TH_LOW,
            nn_ratio=0.7,
            angle_a=jnp.asarray(self.map.kf_feat_angle[k]),
            angle_b=jnp.asarray(frame.angle),
            check_rotation=True,
        )
        idx = np.asarray(idx)
        src = np.nonzero(idx >= 0)[0]
        if len(src) < 15:
            return False
        frame.Tcw = (
            self.last_frame.Tcw.copy() if self.last_frame.Tcw is not None else self.map.kf_Tcw[k].copy()
        )
        frame.mp_idx[:] = -1
        frame.mp_idx[idx[src]] = self.map.kf_mp_idx[k][src]
        n_in = self._pose_optimize(frame)
        self.log(f"frame {frame.frame_id}: ref-KF {len(src)} matches, {n_in} inliers")
        return n_in >= 10

    def _track_local_map(self, frame: FrameData) -> int:
        """Tracking.cc:1172: widen matches to the covisible local map, then a
        final pose optimization."""
        local_kfs = self._local_keyframes(frame)
        if len(local_kfs) == 0:
            return self._pose_optimize(frame)
        mp_set = np.unique(self.map.kf_mp_idx[local_kfs])
        mp_set = mp_set[(mp_set >= 0) & self.map.mp_valid[np.maximum(mp_set, 0)]]
        already = set(frame.mp_idx[frame.mp_idx >= 0].tolist())
        cand = np.array([p for p in mp_set if p not in already], np.int32)
        if len(cand) > 0:
            pts = self.map.mp_pos[cand]
            proj = self._project(frame.Tcw, pts)
            pc = (frame.Tcw[:3, :3] @ pts.T).T + frame.Tcw[:3, 3]
            depth = pc[:, 2]
            dist = np.linalg.norm(pts - self._cam_center(frame.Tcw), axis=-1)
            in_range = (
                (depth > 0)
                & (proj[:, 0] >= 0)
                & (proj[:, 0] < self.cfg.camera.width)
                & (proj[:, 1] >= 0)
                & (proj[:, 1] < self.cfg.camera.height)
                & (dist >= 0.8 * self.map.mp_min_dist[cand])
                & (dist <= 1.2 * self.map.mp_max_dist[cand])
            )
            # viewing angle < 60 deg vs. point normal (Frame::isInFrustum)
            view = (pts - self._cam_center(frame.Tcw)) / np.maximum(dist[:, None], 1e-9)
            cosv = (view * self.map.mp_normal[cand]).sum(-1)
            in_range &= cosv > 0.5
            self.map.mp_visible[cand[in_range]] += 1
            cand = cand[in_range]
            proj = proj[in_range]
            if len(cand) > 0:
                # predict octave from distance (MapPoint::PredictScale)
                ratio = np.maximum(self.map.mp_max_dist[cand] / np.maximum(dist[in_range], 1e-9), 1.0)
                pred_level = np.clip(
                    np.ceil(np.log(ratio) / np.log(self.cfg.orb.scale_factor)).astype(np.int32),
                    0,
                    self.cfg.orb.n_levels - 1,
                )
                radius = 4.0 * self.cfg.orb.scale_factor ** pred_level.astype(np.float32)
                nb = bucket(len(cand))
                sm = matching.window_mask(
                    jnp.asarray(pad_rows(proj, nb)),
                    jnp.asarray(frame.xy),
                    jnp.asarray(pad_rows(radius, nb)),
                    jnp.asarray(pad_rows(pred_level, nb)),
                    jnp.asarray(frame.octave),
                    level_window=1,
                )
                # only unmatched frame features may bind
                free = jnp.asarray((frame.mp_idx < 0) & frame.valid)
                idx, _ = matching.match_descriptors(
                    jnp.asarray(pad_rows(self.map.mp_desc[cand], nb)),
                    jnp.asarray(row_mask(len(cand), nb)),
                    jnp.asarray(frame.desc),
                    free,
                    spatial_mask=sm,
                    max_dist=matching.TH_HIGH,
                    nn_ratio=0.8,
                )
                idx = np.asarray(idx)
                src = np.nonzero(idx >= 0)[0]
                frame.mp_idx[idx[src]] = cand[src]
                self.map.mp_found[cand[src]] += 1

        n_in = self._pose_optimize(frame)
        self.log(f"frame {frame.frame_id}: local map -> {n_in} inliers")
        return n_in

    def _local_keyframes(self, frame: FrameData) -> np.ndarray:
        """KFs sharing points with the frame + their best covisibles
        (UpdateLocalKeyFrames, Tracking.cc:1486)."""
        bound = frame.mp_idx[frame.mp_idx >= 0]
        if len(bound) == 0:
            if self.ref_kf >= 0:
                return np.array([self.ref_kf], np.int64)
            return np.array([], np.int64)
        counts: dict[int, int] = {}
        for p in bound:
            n = self.map.mp_obs_n[p]
            for k in self.map.mp_obs_kf[p, :n]:
                counts[int(k)] = counts.get(int(k), 0) + 1
        kfs = sorted(counts, key=counts.get, reverse=True)[:80]
        if kfs:
            self.ref_kf = kfs[0]
        expanded = set(kfs)
        for k in kfs[:10]:
            expanded.update(self.map.best_covisible(k, 10).tolist())
        return np.fromiter(expanded, np.int64)

    # ------------------------------------------------------------- keyframes

    def _need_new_keyframe(self, frame: FrameData, n_inliers: int) -> bool:
        """Tracking.cc:1217-1311 monocular conditions. In the synchronous
        step-interleaved scheduler the mapper is idle by construction; in
        async mode the reference's mapper-idle interplay applies: c1b requires
        an idle mapper (:1259), and when the conditions hold but the mapper is
        busy, the in-flight local BA is interrupted and NO keyframe is created
        (monocular, :1290-1302)."""
        t = self.cfg.tracking
        if self.only_tracking:  # Tracking.cc:1221
            return False
        if self.map.n_keyframes == 0:
            return False
        pipeline = getattr(self.system, "pipeline", None) if self.system is not None else None
        idle = pipeline.idle() if pipeline is not None else True
        # nRefMatches = ReferenceKF->TrackedMapPoints(nMinObs): points seen
        # from >= 3 keyframes (2 while the map is tiny) — Tracking.cc:1237-1244
        ref_tracked = 0
        if self.ref_kf >= 0:
            min_obs = 3 if self.map.n_keyframes > 2 else 2
            mp = self.map.kf_mp_idx[self.ref_kf]
            ids = mp[mp >= 0]
            if len(ids):
                ref_tracked = int(
                    (self.map.mp_valid[ids] & (self.map.mp_obs_n[ids] >= min_obs)).sum()
                )
        th_ref = max(int(0.9 * ref_tracked), 15)
        c1a = frame.frame_id >= self.last_kf_frame_id + t.max_frames
        c1b = frame.frame_id >= self.last_kf_frame_id + t.min_frames and idle
        c2 = n_inliers < th_ref and n_inliers > 15
        # the trailing c1a clause keeps keyframe cadence on sequences where
        # tracking is too good for c2 (synthetic worlds track > 0.9*ref)
        want = bool((c1a or c1b) and c2) or bool(c1a and n_inliers > 15)
        if not want:
            return False
        # KF-condition log (the reference logs c1a/c1b/c1c/c2, Tracking.cc:1284)
        self.log(
            f"frame {frame.frame_id}: KF due c1a={int(c1a)} c1b={int(c1b)} "
            f"c2={int(c2)} inl={n_inliers} ref_tracked={ref_tracked} "
            f"ref_kf={self.ref_kf}"
        )
        if idle:
            return True
        pipeline.interrupt_ba()  # Tracking.cc:1293
        # Bounded deviation from the reference's strict monocular idle gate
        # (Tracking.cc:1290-1302 refuses whenever the mapper is mid-keyframe):
        # CADENCE-due keyframes (c1a — the 30-frame interval that carries the
        # NMI anchor schedule) are still accepted when nothing further is
        # queued, because on a rig where mapper latency exceeds the cadence
        # interval the strict gate starves keyframes -> no NMI anchors ->
        # unbounded drift, the failure the fork exists to prevent. (The
        # reference's stereo path makes the same trade with a queue<3 gate,
        # Tracking.cc:1296-1301.) Pure-c2 inserts keep the STRICT gate: the
        # queue-empty relaxation bounded queue LENGTH, not RATE, so c2
        # bursts created a keyframe every other frame — ~10x the mapper
        # device work of the reference's busy-refusal behavior.
        return c1a and pipeline.queue_empty()

    def _create_keyframe(self, frame: FrameData):
        k = self.map.add_keyframe(
            frame.Tcw,
            frame.frame_id,
            frame.timestamp,
            frame.xy,
            frame.octave,
            frame.angle,
            frame.desc,
            frame.valid,
            mp_idx=np.where(frame.outlier, -1, frame.mp_idx),
            nmi_relocalized=frame.nmi_relocalized,
            nmi_failed=frame.nmi_failed,
        )
        self.ref_kf = k
        self.last_kf_frame_id = frame.frame_id
        pipeline = getattr(self.system, "pipeline", None) if self.system is not None else None
        if pipeline is not None:
            # async mode: hand the KF to the mapping worker and return —
            # tracking never blocks on BA (LocalMapping::InsertKeyFrame,
            # Tracking.cc:1387). BA-refined poses reach later frames through
            # the shared map under the map lock.
            if self.system is not None:
                self.system.ensure_vocabulary(frame.desc, frame.valid)
            pipeline.insert_keyframe(k)
        else:
            if self.local_mapper is not None:
                self.local_mapper.process_keyframe(k)
                frame.Tcw = self.map.kf_Tcw[k].copy()
            # place recognition: train vocab on first KF if needed, feed the
            # loop closer (LoopClosing::InsertKeyFrame, LocalMapping.cc:90)
            if self.system is not None:
                self.system.ensure_vocabulary(frame.desc, frame.valid)
                if self.system.loop_closer is not None:
                    if self.system.loop_closer.process_keyframe(k):
                        frame.Tcw = self.map.kf_Tcw[k].copy()
            # adopt the keyframe's refreshed observation row: local mapping
            # binds newly triangulated points to feature rows and fuse remaps
            # replaced landmarks — in the reference mLastFrame's MapPoint*
            # stay live through MapPoint::Replace forwarding; with SoA ids
            # the equivalent is re-reading the row (keeps the motion model
            # fed with fresh, BA-refined bindings)
            n = len(frame.mp_idx)
            fresh = self.map.kf_mp_idx[k, :n].copy()
            fresh[fresh >= 0] = np.where(
                self.map.mp_valid[fresh[fresh >= 0]], fresh[fresh >= 0], -1
            )
            frame.mp_idx = fresh
            frame.outlier = np.zeros(n, bool)
        self.log(f"frame {frame.frame_id}: new keyframe {k}")

    # -------------------------------------------------------- relocalization

    def _relocalize(self, frame: FrameData) -> bool:
        """BoW + PnP relocalization after tracking loss with the reference's
        guided-projection expansion loop (Tracking::Relocalization,
        Tracking.cc:1596-1753): PnP -> pose LM -> if <50 inliers, a coarse
        SearchByProjection (window 10, Hamming 100), re-optimize, then a
        narrow pass (window 3, Hamming 64); accept only at >= 50 inliers."""
        db = self.system.database if self.system is not None else None
        if db is None:
            return False
        import jax

        from orbslam2_nmi_tpu.solvers import pnp

        cands = db.detect_relocalization_candidates(self.map, frame.desc, frame.valid)
        if not cands:
            return False
        if self._rng_key is None:
            self._rng_key = jax.random.PRNGKey(11)
        for cand in cands:
            has_mp = self.map.kf_mp_idx[cand] >= 0
            if has_mp.sum() < 15:
                continue
            idx, _ = matching.match_descriptors(
                jnp.asarray(self.map.kf_feat_desc[cand]),
                jnp.asarray(has_mp),
                jnp.asarray(frame.desc),
                jnp.asarray(frame.valid),
                max_dist=matching.TH_LOW,
                nn_ratio=0.75,
                angle_a=jnp.asarray(self.map.kf_feat_angle[cand]),
                angle_b=jnp.asarray(frame.angle),
                check_rotation=True,
            )
            idx = np.asarray(idx)
            src = np.nonzero(idx >= 0)[0]
            if len(src) < 15:  # Tracking.cc:1633 nmatches<15
                continue
            mp_ids = self.map.kf_mp_idx[cand][src]
            pts = self.map.mp_pos[mp_ids]
            uv = frame.xy[idx[src]]
            self._rng_key, sub = jax.random.split(self._rng_key)
            nb = bucket(len(src))
            res = pnp.pnp_ransac(
                sub,
                jnp.asarray(self.K),
                jnp.asarray(pad_rows(pts, nb)),
                jnp.asarray(pad_rows(uv, nb)),
                jnp.asarray(pad_rows(self.inv_sigma2[frame.octave[idx[src]]], nb, 1.0)),
                jnp.asarray(row_mask(len(src), nb)),
                min_inliers=10,  # SetRansacParameters(0.99,10,300,...) :1641
            )
            if not bool(res.ok):
                continue
            frame.Tcw = np.asarray(res.Tcw)
            frame.mp_idx[:] = -1
            inl = np.asarray(res.inliers)[: len(src)]
            frame.mp_idx[idx[src[inl]]] = mp_ids[inl]
            n_good = self._pose_optimize(frame)
            if n_good < 10:
                continue
            frame.mp_idx[frame.outlier] = -1  # Tracking.cc:1699
            # expansion loop (Tracking.cc:1705-1737)
            if n_good < 50:
                n_add = self._search_by_projection_kf(frame, cand, th=10.0, max_dist=100)
                if n_add + n_good >= 50:
                    n_good = self._pose_optimize(frame)
                    if 30 < n_good < 50:
                        n_add = self._search_by_projection_kf(frame, cand, th=3.0, max_dist=64)
                        if n_good + n_add >= 50:
                            n_good = self._pose_optimize(frame)
                            frame.mp_idx[frame.outlier] = -1
            if n_good < 50:  # Tracking.cc:1741 accept only at >= 50
                continue
            self.ref_kf = cand
            self.log(
                f"frame {frame.frame_id}: relocalized against KF {cand} "
                f"({n_good} inliers)"
            )
            return True
        return False

    def _search_by_projection_kf(
        self, frame: FrameData, kf: int, th: float, max_dist: int
    ) -> int:
        """SearchByProjection(Frame, KeyFrame, sAlreadyFound, th, ORBdist)
        (ORBmatcher.cc relocalization variant): project the keyframe's map
        points not yet bound in the frame at the frame's current pose and bind
        window matches. Returns the number of new bindings."""
        m = self.map
        already = set(frame.mp_idx[frame.mp_idx >= 0].tolist())
        cand_mps = np.unique(m.kf_mp_idx[kf])
        cand_mps = cand_mps[(cand_mps >= 0) & m.mp_valid[np.maximum(cand_mps, 0)]]
        cand_mps = np.array([p for p in cand_mps if p not in already], np.int64)
        if len(cand_mps) == 0:
            return 0
        pts = m.mp_pos[cand_mps]
        pc = pts @ frame.Tcw[:3, :3].T + frame.Tcw[:3, 3]
        z = pc[:, 2]
        proj = self._project(frame.Tcw, pts)
        dist = np.linalg.norm(pts - self._cam_center(frame.Tcw), axis=-1)
        # 0.8/1.2 margins = MapPoint::Get{Min,Max}DistanceInvariance
        ok = (
            (z > 0)
            & (proj[:, 0] >= 0) & (proj[:, 0] < self.cfg.camera.width)
            & (proj[:, 1] >= 0) & (proj[:, 1] < self.cfg.camera.height)
            & (dist >= 0.8 * m.mp_min_dist[cand_mps])
            & (dist <= 1.2 * m.mp_max_dist[cand_mps])
        )
        cand_mps, proj, dist = cand_mps[ok], proj[ok], dist[ok]
        if len(cand_mps) == 0:
            return 0
        sf = self.cfg.orb.scale_factor
        n_lv = self.cfg.orb.n_levels
        ratio = np.clip(
            m.mp_max_dist[cand_mps] / np.maximum(dist, 1e-9), 1.0, float(sf) ** n_lv
        )
        pred = np.clip(np.ceil(np.log(ratio) / np.log(sf)).astype(np.int32), 0, n_lv - 1)
        radius = th * sf ** pred.astype(np.float32)
        nb = bucket(len(cand_mps))
        sm = matching.window_mask(
            jnp.asarray(pad_rows(proj.astype(np.float32), nb)),
            jnp.asarray(frame.xy),
            jnp.asarray(pad_rows(radius, nb)),
            jnp.asarray(pad_rows(pred, nb)),
            jnp.asarray(frame.octave),
            level_window=1,
        )
        free = jnp.asarray((frame.mp_idx < 0) & frame.valid)
        idx, _ = matching.match_descriptors(
            jnp.asarray(pad_rows(m.mp_desc[cand_mps], nb)),
            jnp.asarray(row_mask(len(cand_mps), nb)),
            jnp.asarray(frame.desc),
            free,
            spatial_mask=sm,
            max_dist=max_dist,
            apply_ratio=False,
        )
        idx = np.asarray(idx)[: len(cand_mps)]
        got = np.nonzero(idx >= 0)[0]
        frame.mp_idx[idx[got]] = cand_mps[got]
        return len(got)

    # ------------------------------------------------------------------ NMI

    def _submit_async_nmi(self, frame: FrameData) -> bool:
        """Hand the sweep for the just-created keyframe (self.ref_kf) to the
        async NMI worker (slam/nmi/async_worker.py). Returns False when a
        sweep is already in flight — the caller then keeps the
        every-reloc_frequency counter due so the next keyframe retries."""
        worker = self.system.nmi_worker
        return worker.submit(
            self.ref_kf,
            self._gray.astype(np.float32),
            frame.Tcw,
            self.dist_since_nmi,
            self.rot_since_nmi,
            frame.frame_id,
        )

    def _run_nmi(
        self, frame: FrameData, initializing: bool, search_scale: float = 1.0
    ) -> bool:
        if self.nmi is None:
            return False
        widen = 1.0
        if not initializing and self.nmi_fail_streak:
            widen = 1.0 + 0.75 * min(self.nmi_fail_streak, 6)
        out = self.nmi.relocalize_strategy(
            jnp.asarray(self._gray.astype(np.float32)),
            frame.Tcw,
            dist_since=tuple(self.dist_since_nmi),
            rot_since=tuple(self.rot_since_nmi),
            initializing=initializing,
            search_scale=search_scale * widen,
        )
        if not initializing:
            self.nmi_fail_streak = 0 if out.relocalized else self.nmi_fail_streak + 1
        frame.previous_poses.extend(out.previous_poses)
        frame.Tcw = out.Tcw
        frame.nmi_relocalized = out.relocalized
        frame.nmi_failed = out.failed
        if out.relocalized:
            # reset ONLY the drift axes the kernel searched (num > 1) —
            # Tracking.cc:600-612 checks getNumSynth{X,Y,Z}/getNumWarp{X,Y,Z};
            # collapsed axes keep accumulating so later searches stay sized
            for ax in range(3):
                if out.num_synth[ax] > 1:
                    self.dist_since_nmi[ax] = 0.0
                if out.num_warp[ax] > 1:
                    self.rot_since_nmi[ax] = 0.0
        self.log(
            f"frame {frame.frame_id}: NMI {'ok' if out.relocalized else 'FAILED'} "
            f"score={out.nmi:.4f} iters={out.iterations}"
        )
        return out.relocalized

    # ----------------------------------------------------------------- utils

    def reset(self):
        """System::Reset semantics (Tracking.cc:1759-1808): wipe the map and
        reinitialize from scratch."""
        self.map.clear()
        self.n_resets += 1
        self.state = TrackingState.NOT_INITIALIZED
        self.velocity = None
        self.init_frame = None
        self.trajectory = []  # Tracking.cc:1801-1804 clears the relative lists
        self.ref_kf = -1
        self.last_kf_frame_id = -1
        self.kfs_since_last_nmi = 0
        self.dist_since_nmi[:] = 0.0
        self.rot_since_nmi[:] = 0.0
        self.nmi_fail_streak = 0
        if self.local_mapper is not None:
            self.local_mapper.recent_points = []
        if self.system is not None and self.system.loop_closer is not None:
            self.system.loop_closer.consistent_groups = []
            self.system.loop_closer.loop_edges = []
            self.system.database.clear()

    def _project(self, Tcw: np.ndarray, pts: np.ndarray) -> np.ndarray:
        pc = (Tcw[:3, :3] @ pts.T).T + Tcw[:3, 3]
        z = np.where(np.abs(pc[:, 2]) > 1e-9, pc[:, 2], 1e-9)
        return np.stack(
            [
                self.K[0, 0] * pc[:, 0] / z + self.K[0, 2],
                self.K[1, 1] * pc[:, 1] / z + self.K[1, 2],
            ],
            axis=-1,
        )

    @staticmethod
    def _cam_center(Tcw: np.ndarray) -> np.ndarray:
        return -Tcw[:3, :3].T @ Tcw[:3, 3]
