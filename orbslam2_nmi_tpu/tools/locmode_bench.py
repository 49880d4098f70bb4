"""Localization-only mode at scale: frozen-map second pass over the circuit.

Builds a full map over the 520-frame circuit (pass 1, full SLAM), then
activates localization-only mode (System::ActivateLocalizationMode,
System.cc:298-303) and re-tracks the WHOLE sequence against the frozen map
(pass 2): no keyframes, no mapping, no loop closing — the mbOnlyTracking
branch of Track() with its mbVO fallback (Tracking.cc:402-530, :1163-1165).
The pass-2 entry is a teleport back to frame 0 (broken motion model), so it
must recover through BoW+EPnP relocalization first.

Reports: pass-2 tracked fraction (r4 VERDICT target >= 95%), unaligned ATE
against exact ground truth, relocalization events, and mbVO episode count.
"""

from __future__ import annotations

import json

import numpy as np


def main():
    import argparse

    from orbslam2_nmi_tpu.slam.tracking import TrackingState
    from orbslam2_nmi_tpu.tools.replay_bench import build_system, generate_sequence
    from orbslam2_nmi_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--frames", type=int, default=520)
    p.add_argument("--no-nmi", action="store_true")
    p.add_argument("--pipelined-build", action="store_true",
                   help="build pass 1 with the fused front-end")
    p.add_argument("--out", default="LOCMODE_r05.json")
    args = p.parse_args()

    world, frames = generate_sequence(args.frames)
    n_frames, height, width = frames.shape
    sys_ = build_system(world, width, height, use_nmi=not args.no_nmi)
    sys_.set_init_poses(
        world.pose_at(0, n_frames), world.pose_at(sys_.cfg.nmi.offset, n_frames)
    )
    ts = np.arange(n_frames) / 30.0

    # ---- pass 1: build the map
    if args.pipelined_build:
        from orbslam2_nmi_tpu.slam.frontend_pipelined import PipelinedFrontend

        fe = PipelinedFrontend(sys_)
        r1 = fe.run(frames, ts, start_id=0)
    else:
        r1 = [sys_.track_monocular(frames[i], float(ts[i])) for i in range(n_frames)]
    n_ok1 = sum(1 for r in r1 if r is not None and r.Tcw is not None
                and r.state == TrackingState.OK)

    # ---- pass 2: frozen map, classic tracker (the reference's mode switch)
    sys_.activate_localization_mode()
    n_kf_before_pass2 = int(sys_.map.n_keyframes)
    tr = sys_.tracker
    n_ok2 = 0
    vo_frames = 0
    vo_episodes = 0
    prev_vo = False
    errs = []
    lost_frames = 0

    def center(T):
        return -T[:3, :3].T @ T[:3, 3]

    errs_vo = []
    for i in range(n_frames):
        fid = n_frames + i
        res = sys_.track_monocular(frames[i], fid / 30.0, frame_id=fid)
        if res.state == TrackingState.OK and res.Tcw is not None:
            n_ok2 += 1
            err = float(np.linalg.norm(
                center(res.Tcw) - center(world.pose_at(i, n_frames))))
            # mbVO frames track on the motion model WITHOUT map matches
            # (Tracking.cc:420-441): their error is unbounded by design
            # until relocalization re-anchors — report them separately
            (errs_vo if tr.vo_mode else errs).append(err)
        else:
            lost_frames += 1
        if tr.vo_mode and not prev_vo:
            vo_episodes += 1
        if tr.vo_mode:
            vo_frames += 1
        prev_vo = tr.vo_mode

    out = {
        "pass1_tracked": n_ok1,
        "pass1_keyframes": n_kf_before_pass2,
        "pass2_tracked": n_ok2,
        "pass2_tracked_frac": round(n_ok2 / n_frames, 3),
        "pass2_lost_frames": lost_frames,
        "pass2_map_anchored_frames": len(errs),
        "pass2_err_rmse_m_map_anchored": round(
            float(np.sqrt(np.mean(np.square(errs)))), 4) if errs else None,
        "pass2_err_max_m_map_anchored": round(max(errs), 4) if errs else None,
        "pass2_err_rmse_m_vo_frames": round(
            float(np.sqrt(np.mean(np.square(errs_vo)))), 4) if errs_vo else None,
        "pass2_err_max_m_vo_frames": round(max(errs_vo), 4) if errs_vo else None,
        "vo_mode_episodes": vo_episodes,
        "vo_mode_frames": vo_frames,
        "map_frozen": int(sys_.map.n_keyframes) == n_kf_before_pass2,
        "use_nmi": not args.no_nmi,
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))
    sys_.shutdown()


if __name__ == "__main__":
    main()
