"""Trajectory + map writers in the reference's output formats.

Parity targets (SURVEY.md §4 ground-truth hooks):
  * SaveFullTrajectory (reference: src/System.cc:514-599):
      `<id> <t> [KF][, NMI][, FAILED] x y z qx qy qz qw` rows (+ a companion
      `_twc` file with inverse-pose matrices and NMI previous poses).
  * SaveKeyFrameTrajectoryTUM (src/System.cc:417): `t x y z qx qy qz qw`.
  * PrintMapPoints .xyz dumps (src/Tracking.cc:2422-2449) via
    io.model_loader.save_xyz_pointcloud.
Plus ATE-RMSE evaluation for the replay harness.
"""

from __future__ import annotations

import numpy as np

from orbslam2_nmi_tpu.geometry import se3


def _quat_wxyz(Rwc: np.ndarray) -> np.ndarray:
    import jax.numpy as jnp

    return np.asarray(se3.rot_to_quat(jnp.asarray(Rwc[None]))[0])


def save_full_trajectory(path: str, rows: list):
    """rows: (frame_id, t, Tcw, flags, previous_poses) as accumulated by the
    Tracker. Writes `<path>.txt` (quat rows) and `<path>_twc.txt` (matrices)."""
    with open(path + ".txt", "w") as f1, open(path + "_twc.txt", "w") as f2:
        for frame_id, t, Tcw, flags, prev in rows:
            Rwc = Tcw[:3, :3].T
            twc = -Rwc @ Tcw[:3, 3]
            q = _quat_wxyz(Rwc)  # [w, x, y, z]
            tag = ""
            if "KF" in flags:
                tag += " KF"
                if "NMI" in flags:
                    tag += ", NMI"
                if "FAILED" in flags:
                    tag += ", FAILED"
            f1.write(
                f"{frame_id} {t:.6f}{tag} "
                f"{twc[0]:.9f} {twc[1]:.9f} {twc[2]:.9f} "
                f"{q[1]:.9f} {q[2]:.9f} {q[3]:.9f} {q[0]:.9f}\n"
            )
            f2.write(f"{frame_id} {t:.6f}{tag}\n")
            if "NMI" in flags and prev:
                f2.write("//////////Previous Poses\\\\\\\\\\\n")
                for P in prev:
                    np.savetxt(f2, P, fmt="%.9f")
                f2.write("//////////Previous Poses End\\\\\\\\\\\n")
            Twc = np.linalg.inv(Tcw)
            np.savetxt(f2, Twc, fmt="%.9f")


def save_keyframe_trajectory_tum(path: str, kf_timestamps: np.ndarray, kf_Tcw: np.ndarray):
    """TUM format: `t x y z qx qy qz qw` per keyframe (System.cc:417)."""
    with open(path, "w") as f:
        for t, Tcw in zip(kf_timestamps, kf_Tcw):
            Rwc = Tcw[:3, :3].T
            twc = -Rwc @ Tcw[:3, 3]
            q = _quat_wxyz(Rwc)
            f.write(
                f"{t:.6f} {twc[0]:.7f} {twc[1]:.7f} {twc[2]:.7f} "
                f"{q[1]:.7f} {q[2]:.7f} {q[3]:.7f} {q[0]:.7f}\n"
            )


def ate_rmse(est_Tcw: list, gt_Tcw: list, align: bool = True) -> float:
    """Absolute trajectory error (RMSE over camera centers), optional SE3
    (Umeyama, scale-free) alignment — the standard TUM evaluation."""
    est = np.array([-T[:3, :3].T @ T[:3, 3] for T in est_Tcw])
    gt = np.array([-T[:3, :3].T @ T[:3, 3] for T in gt_Tcw])
    assert est.shape == gt.shape and len(est) > 0
    if align and len(est) >= 3:
        mu_e, mu_g = est.mean(0), gt.mean(0)
        E, G = est - mu_e, gt - mu_g
        U, _, Vt = np.linalg.svd(E.T @ G)
        S = np.eye(3)
        if np.linalg.det(U @ Vt) < 0:
            S[2, 2] = -1
        R = (U @ S @ Vt).T
        t = mu_g - R @ mu_e
        est = est @ R.T + t
    return float(np.sqrt(np.mean(np.sum((est - gt) ** 2, axis=-1))))
