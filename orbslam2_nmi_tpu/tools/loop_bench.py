"""Loop-closure-on-replay harness: the CorrectLoop chain on a REAL map.

Drives the wide loop-closure circuit (io/synthetic.SyntheticMeshWorld
.generate_wide: disjoint opposite arcs, 15% revisit) through the full
pipeline WITHOUT NMI so drift accumulates, then exercises the complete
LoopClosing chain — Sim3 RANSAC verification, guided matching, OptimizeSim3,
CorrectLoop's Sim3 propagation + SearchAndFuse + essential-graph
optimization + global BA (reference: LoopClosing.cc:239-756) — between the
final keyframe and its geometrically-true revisit partner, and reports ATE
before/after the correction.

Why the explicit pairing: in live replays of this circuit the revisit is
usually consumed by the RELOCALIZATION path first — tracking hiccups on the
approach, Relocalization() re-attaches the camera to the start-arc keyframes
(e.g. "frame 419: relocalized against KF 3"), and from then on every new
keyframe is covisibility-connected to the loop region, which correctly
disqualifies it as a DetectLoop candidate (the reference excludes connected
keyframes too, LoopClosing.cc:147). The detection front door is exercised in
every replay (candidates are generated and adversarially rejected through
the reference's own gates — the logs record each); this harness pins the
correction machinery itself on real replay state rather than synthetic
fixtures. Output: one JSON line.
"""

from __future__ import annotations

import json

import numpy as np


def run(n_frames: int = 520, width: int = 960, height: int = 540) -> dict:
    from orbslam2_nmi_tpu.io.trajectory import ate_rmse, recompose_trajectory
    from orbslam2_nmi_tpu.tools import replay_bench
    from orbslam2_nmi_tpu.slam.tracking import TrackingState

    world, frames = replay_bench.generate_sequence(
        n_frames, width, height, circuit="wide"
    )
    sys_ = replay_bench.build_system(
        world, width, height, use_nmi=False, async_mapping=False, max_frames=15,
    )
    sys_.set_init_poses(
        world.pose_at(0, n_frames), world.pose_at(sys_.cfg.nmi.offset, n_frames)
    )
    n_ok = 0
    for i in range(n_frames):
        res = sys_.track_monocular(frames[i], i / 30.0)
        if res.state == TrackingState.OK and res.Tcw is not None:
            n_ok += 1

    m = sys_.map
    lc = sys_.loop_closer

    def ate_now():
        with m.lock:
            rows = recompose_trajectory(sys_.tracker.trajectory, m)
        est = [r[2] for r in rows]
        gt = [world.pose_at(r[0], n_frames) for r in rows]
        return float(ate_rmse(est, gt, align=True))

    ate_before = ate_now()
    n_loops_detected = len(lc.loop_edges) if lc is not None else 0

    # the geometrically-true partner of the final keyframe: the earliest-arc
    # keyframe whose GROUND-TRUTH camera center is nearest (the revisit arc
    # re-traverses the first 15% of the circuit)
    out = {
        "n_frames": n_frames,
        "n_tracked": n_ok,
        "n_keyframes": int(m.n_keyframes),
        "ate_before_m": round(ate_before, 4),
        "loops_closed_by_detection": n_loops_detected,
    }
    with m.lock:
        valid = [int(k) for k in m.valid_keyframe_indices()]
    if lc is None or len(valid) < 10:
        out["error"] = "no loop closer / too few keyframes"
        return out
    k_last = max(valid, key=lambda k: int(m.kf_frame_id[k]))
    fid_last = int(m.kf_frame_id[k_last])
    c_last = world.pose_at(fid_last, n_frames)
    c_last = -c_last[:3, :3].T @ c_last[:3, 3]
    early = [k for k in valid if m.kf_frame_id[k] < 0.3 * fid_last]
    if not early:
        out["error"] = "no early-arc keyframes survive"
        return out

    def gt_center(k):
        T = world.pose_at(int(m.kf_frame_id[k]), n_frames)
        return -T[:3, :3].T @ T[:3, 3]

    cand = min(early, key=lambda k: float(np.linalg.norm(gt_center(k) - c_last)))
    out["pair"] = [int(k_last), int(cand)]
    out["pair_gt_gap_m"] = round(float(np.linalg.norm(gt_center(cand) - c_last)), 3)

    with m.lock:
        ok, Scw_corr, matched_cur, loop_mps = lc._compute_sim3(k_last, cand)
        out["sim3_verified"] = bool(ok)
        if ok:
            lc._correct_loop(k_last, cand, Scw_corr, matched_cur, loop_mps)
    if ok:
        # synchronous mode: global BA after the essential graph
        sys_.local_mapper.global_ba(iters=10)
        out["ate_after_m"] = round(ate_now(), 4)
        out["n_loop_edges"] = len(lc.loop_edges)
    sys_.shutdown()
    return out


def main():
    from orbslam2_nmi_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    print(json.dumps(run(), indent=2))


if __name__ == "__main__":
    main()
