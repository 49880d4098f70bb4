"""System facade: builds subsystems and exposes the tracking + saving API.

TPU-native equivalent of ORB_SLAM2::System (reference: src/System.cc:50-141
ctor, TrackMonocular :246, Shutdown :329, SaveFullTrajectory :514,
SaveKeyFrameTrajectoryTUM :417). The reference spawns LocalMapping /
LoopClosing / Viewer threads (System.cc:116-126); here the pipeline is
step-interleaved (SURVEY.md §2.4 P1): local mapping runs synchronously per
keyframe, loop closing per keyframe batch — same effects, deterministic
execution, no mutexes.
"""

from __future__ import annotations

import os
import time
from typing import Optional

import numpy as np

from orbslam2_nmi_tpu.config import SystemConfig, load_yaml_config
from orbslam2_nmi_tpu.io import model_loader, trajectory
from orbslam2_nmi_tpu.ops import render
from orbslam2_nmi_tpu.slam.local_mapping import LocalMapper
from orbslam2_nmi_tpu.slam.map_store import MapStore
from orbslam2_nmi_tpu.slam.nmi.localizer import NMILocalizer
from orbslam2_nmi_tpu.slam.tracking import Tracker, TrackResult


class SLAMSystem:
    def __init__(
        self,
        cfg: SystemConfig,
        nmi_model: Optional[render.RenderModel] = None,
        use_nmi: bool = True,
        output_dir: Optional[str] = None,
        verbose: bool = False,
    ):
        self.cfg = cfg
        self.output_dir = output_dir or cfg.output_dir
        os.makedirs(self.output_dir, exist_ok=True)
        self._log_path = os.path.join(self.output_dir, "_log.txt")
        self._verbose = verbose
        self._t0 = time.time()

        if nmi_model is None and use_nmi:
            nmi_model = self._load_model_from_config()
        self.map = MapStore(cfg)
        self.localizer = (
            NMILocalizer(cfg.nmi, cfg.camera, nmi_model, log_fn=self.log)
            if (use_nmi and nmi_model is not None)
            else None
        )
        self.local_mapper = LocalMapper(cfg, self.map, log_fn=self.log)
        self.tracker = Tracker(
            cfg, self.map, self.local_mapper, self.localizer, log_fn=self.log
        )
        self.frame_times: list[float] = []

    @classmethod
    def from_yaml(cls, settings_path: str, **kw) -> "SLAMSystem":
        return cls(load_yaml_config(settings_path), **kw)

    def _load_model_from_config(self) -> Optional[render.RenderModel]:
        nmi = self.cfg.nmi
        try:
            if nmi.render_mode == 4 and nmi.model_cloud_path:
                pc = model_loader.load_xyz_pointcloud(
                    nmi.model_cloud_path, nmi.model_offset_path or None
                )
                return render.model_from_pointcloud(pc)
            if nmi.model_obj_path:
                mesh = model_loader.load_obj(nmi.model_obj_path, nmi.model_texture_path or None)
                return render.model_from_pointcloud(render.mesh_to_points(mesh))
        except FileNotFoundError:
            self.log(f"NMI model not found ({nmi.model_obj_path or nmi.model_cloud_path}); NMI disabled")
        return None

    # ----------------------------------------------------------------- api

    def track_monocular(self, gray_u8: np.ndarray, timestamp: float, frame_id: Optional[int] = None) -> TrackResult:
        """System::TrackMonocular (System.cc:246) -> Tracking::GrabImageMonocular."""
        if frame_id is None:
            frame_id = len(self.frame_times)
        t0 = time.time()
        res = self.tracker.process_frame(frame_id, timestamp, gray_u8)
        self.frame_times.append(time.time() - t0)
        return res

    def set_init_poses(self, Tcw1: np.ndarray, Tcw2: np.ndarray):
        self.tracker.set_init_poses(Tcw1, Tcw2)

    def log(self, msg: str):
        line = f"[{time.time() - self._t0:9.3f}] {msg}"
        with open(self._log_path, "a") as f:
            f.write(line + "\n")
        if self._verbose:
            print(line)

    # -------------------------------------------------------------- outputs

    def save_full_trajectory(self, name: str = "FullTrajectory"):
        trajectory.save_full_trajectory(
            os.path.join(self.output_dir, name), self.tracker.trajectory
        )

    def save_keyframe_trajectory_tum(self, name: str = "KeyFrameTrajectory.txt"):
        kfs = self.map.valid_keyframe_indices()
        trajectory.save_keyframe_trajectory_tum(
            os.path.join(self.output_dir, name),
            self.map.kf_timestamp[kfs],
            self.map.kf_Tcw[kfs],
        )

    def print_map_points(self, name: str = "MapPoints.xyz"):
        """Tracking::PrintMapPoints (Tracking.cc:2422-2449)."""
        ps = self.map.valid_point_indices()
        model_loader.save_xyz_pointcloud(
            os.path.join(self.output_dir, name), self.map.mp_pos[ps]
        )

    def shutdown(self):
        """System::Shutdown (System.cc:329): flush outputs, report timing."""
        if self.frame_times:
            ft = np.array(self.frame_times)
            self.log(
                f"median tracking time {np.median(ft)*1e3:.1f} ms, "
                f"mean {ft.mean()*1e3:.1f} ms over {len(ft)} frames"
            )
