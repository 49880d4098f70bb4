"""LIVE in-replay loop closure on the wide circuit — the full chain, observed.

Replays the wide loop-closure circuit (disjoint opposite arcs, 15% revisit,
io/synthetic.SyntheticMeshWorld.generate_wide) through the FULL async
pipeline without NMI, so monocular drift accumulates and the end-of-circuit
revisit must be closed by the LoopClosing chain itself: DetectLoop ->
Sim3 RANSAC -> CorrectLoop -> SearchAndFuse -> essential graph -> threaded
abortable global BA (reference: LoopClosing.cc:111-756).

Unlike r4's loop_bench (which pinned the correction machinery on a chosen
keyframe pair), every stage here fires ORGANICALLY from the replay. The
harness instruments the firing: recomposed-trajectory ATE immediately
before the correction, after the essential graph, and after the global BA
lands; the GBA duration; and the max per-frame wall stall while the GBA
thread runs (the no-multi-second-stall requirement, r4 VERDICT #7).
"""

from __future__ import annotations

import json
import time

import numpy as np


def run(n_frames: int = 520, width: int = 960, height: int = 540,
        use_nmi: bool = False, max_frames: int = 15,
        n_features: int = 2000, domain_gap: bool = False) -> dict:
    from orbslam2_nmi_tpu.io.trajectory import ate_rmse, recompose_trajectory
    from orbslam2_nmi_tpu.slam.frontend_pipelined import PipelinedFrontend
    from orbslam2_nmi_tpu.slam.tracking import TrackingState
    from orbslam2_nmi_tpu.tools import replay_bench

    # domain_gap degrades matching smoothly (full feature budget survives,
    # drift accumulates) — the measurable-correction regime; a lean feature
    # budget instead collapses tracking outright (LOOP_LIVE600/1200 runs:
    # 243-310/520 tracked, <=10 KFs, no revisit to detect)
    world, frames = replay_bench.generate_sequence(
        n_frames, width, height, circuit="wide", domain_gap=domain_gap
    )
    sys_ = replay_bench.build_system(
        world, width, height, use_nmi=use_nmi, async_mapping=True,
        max_frames=max_frames, n_features=n_features,
    )
    sys_.set_init_poses(
        world.pose_at(0, n_frames), world.pose_at(sys_.cfg.nmi.offset, n_frames)
    )
    m = sys_.map

    def ate_now():
        rows = recompose_trajectory(sys_.tracker.trajectory, m)
        if not rows:
            return None
        est = [r[2] for r in rows]
        gt = [world.pose_at(r[0], n_frames) for r in rows]
        return round(float(ate_rmse(est, gt, align=not use_nmi)), 4)

    # instrument the organic firing (called with the map lock held). The
    # loop closer is built LAZILY once the vocabulary trains from early
    # keyframes (SLAMSystem.ensure_vocabulary), so hook its construction.
    events: list = []

    def install(lc):
        orig_correct = lc._correct_loop

        def correct_wrapped(k, cand, Scw_corr, matched_cur=None, loop_mps=None):
            ev = {"kf": int(k), "cand": int(cand),
                  "frame_id": int(m.kf_frame_id[k]),
                  "ate_before_m": ate_now(), "t_fire": time.perf_counter()}
            t0 = time.perf_counter()
            orig_correct(k, cand, Scw_corr, matched_cur, loop_mps)
            ev["correct_loop_s"] = round(time.perf_counter() - t0, 2)
            ev["ate_after_essential_graph_m"] = ate_now()
            events.append(ev)

        lc._correct_loop = correct_wrapped

    if sys_.loop_closer is not None:
        install(sys_.loop_closer)
    else:
        orig_build = sys_._build_place_recognition

        def build_wrapped():
            orig_build()
            install(sys_.loop_closer)

        sys_._build_place_recognition = build_wrapped

    fe = PipelinedFrontend(sys_)
    ts = np.arange(n_frames) / 30.0
    results = fe.run(frames, ts, start_id=0)
    n_ok = sum(1 for r in results if r is not None and r.Tcw is not None
               and r.state == TrackingState.OK)
    # wait for the GBA thread (LoopClosing.cc:652 semantics) and measure it
    t0 = time.perf_counter()
    sys_.pipeline.flush(timeout=600.0)
    gba_drain_s = round(time.perf_counter() - t0, 2)
    if sys_.nmi_worker is not None:
        sys_.nmi_worker.flush(timeout=600.0)
    assert not sys_.pipeline.errors(), sys_.pipeline.errors()[0]

    with m.lock:
        ate_final = ate_now()
        n_anchors = int(np.sum(m.kf_nmi_reloc[m.valid_keyframe_indices()]))

    # per-frame wall stalls while the loop correction + GBA were in flight
    walls = [fe.completion_walls[f] for f in sorted(fe.completion_walls)]
    d = np.diff(np.asarray(walls))
    stalls = {}
    for ev in events:
        tf = ev.pop("t_fire")
        after = [walls[i + 1] - walls[i] for i in range(len(d))
                 if walls[i] >= tf and walls[i + 1] <= tf + 30.0]
        if after:
            stalls[f"kf{ev['kf']}"] = {
                "frame_stall_max_s_within_30s": round(max(after), 2),
                "frame_stall_p50_s": round(float(np.median(after)), 3),
            }
    out = {
        "n_frames": n_frames,
        "n_tracked": n_ok,
        "n_keyframes": int(m.n_keyframes),
        "n_kf_valid": int(m.kf_valid.sum()),
        "use_nmi": use_nmi,
        "n_loop_closures": (
            len(sys_.loop_closer.loop_edges) if sys_.loop_closer else 0
        ),
        "loop_events": events,
        "ate_final_m": ate_final,
        "gba_drain_at_end_s": gba_drain_s,
        "frame_stalls_during_correction": stalls,
        "frame_ms_p50": round(float(np.median(d)) * 1e3, 1),
        "frame_ms_p95": round(float(np.quantile(d, 0.95)) * 1e3, 1),
        "frame_ms_max": round(float(d.max()) * 1e3, 1),
        "n_nmi_anchors": n_anchors,
    }
    sys_.shutdown()
    return out


def main():
    import argparse

    from orbslam2_nmi_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--frames", type=int, default=520)
    p.add_argument("--use-nmi", action="store_true")
    p.add_argument("--max-frames", type=int, default=15,
                   help="keyframe cadence cap (denser KFs on the wide circuit)")
    p.add_argument("--features", type=int, default=2000,
                   help="ORB budget; a lean budget (e.g. 600) manufactures "
                        "the mid-drift regime where the correction is "
                        "measurable (r4 VERDICT #3)")
    p.add_argument("--domain-gap", action="store_true",
                   help="photometric-gap camera imagery: matching degrades "
                        "smoothly at full feature budget, manufacturing the "
                        "mid-drift regime where the correction is measurable")
    p.add_argument("--out", default="")
    args = p.parse_args()
    out = run(args.frames, use_nmi=args.use_nmi, max_frames=args.max_frames,
              n_features=args.features, domain_gap=args.domain_gap)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
