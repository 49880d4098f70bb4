"""Per-frame diagnostic replay of the 520-frame circuit — far-arc drift probe.

Round-4 finding (FULL_CIRCUIT_r04.json): tracking quality degrades on the
circuit's far arc (frames ~280-440) — keyframe cadence bursts (c2 fires
constantly) and NMI sweeps miss until the widened window recaptures. This
harness instruments the replay the way the reference's _log.txt does
(per-stage inlier counts, Tracking.cc:427/443/542) but structured: one JSON
row per frame with the ONLINE pose error vs exact ground truth, inlier
count, keyframe decision, and NMI events, so the drift onset can be located
and attributed instead of guessed at.

Usage:
    python -m orbslam2_nmi_tpu.tools.circuit_diag --pipelined [--no-nmi]
        [--frames 520] [--out CIRCUIT_DIAG.jsonl]
"""

from __future__ import annotations

import json
import time

import numpy as np


def center_of(Tcw: np.ndarray) -> np.ndarray:
    return -Tcw[:3, :3].T @ Tcw[:3, 3]


def _flush_rows(f, world, results, lo, hi, n_total):
    for i in range(lo, hi):
        r = results[i]
        gt = world.pose_at(i, n_total)
        row = {"i": i}
        if r is None or r.Tcw is None:
            row["state"] = "none"
        else:
            row["state"] = str(r.state).split(".")[-1]
            row["err_m"] = round(
                float(np.linalg.norm(center_of(r.Tcw) - center_of(gt))), 4
            )
            row["inl"] = int(r.n_inliers)
            row["kf"] = bool(r.is_keyframe)
        f.write(json.dumps(row) + "\n")
    f.flush()


def run_diag(world, frames, pipelined: bool, use_nmi: bool, threshold: float,
             out_path: str, n_total: int = None, domain_gap: bool = False,
             classic_tag: str = "") -> dict:
    from orbslam2_nmi_tpu.io.trajectory import ate_rmse, recompose_trajectory
    from orbslam2_nmi_tpu.slam.tracking import TrackingState
    from orbslam2_nmi_tpu.tools.replay_bench import build_system

    n_frames, height, width = frames.shape
    n_total = n_total or n_frames
    sys_ = build_system(
        world, width, height, use_nmi=use_nmi, async_mapping=True,
        threshold=threshold,
    )
    sys_.set_init_poses(
        world.pose_at(0, n_total), world.pose_at(sys_.cfg.nmi.offset, n_total)
    )
    log_rows: list = []
    orig_log = sys_.log

    def capture_log(msg):
        log_rows.append(msg)
        orig_log(msg)

    sys_.log = capture_log
    sys_.tracker.log = capture_log

    ts = np.arange(n_frames) / 30.0
    t0 = time.perf_counter()
    # chunked drive + incremental row flush: a timed-out run still leaves
    # usable per-frame data on disk
    part = open(out_path + ".part", "w")
    results: list = []
    if pipelined:
        from orbslam2_nmi_tpu.slam.frontend_pipelined import PipelinedFrontend

        fe = PipelinedFrontend(sys_)
        for c0 in range(0, n_frames, 40):
            c1 = min(c0 + 40, n_frames)
            results.extend(fe.run(frames[c0:c1], ts[c0:c1], start_id=c0))
            _flush_rows(part, world, results, c0, c1, n_total)
    else:
        for i in range(n_frames):
            results.append(sys_.track_monocular(frames[i], float(ts[i])))
            if (i + 1) % 40 == 0 or i == n_frames - 1:
                _flush_rows(part, world, results, max(0, i - 39), i + 1, n_total)
    part.close()
    wall = time.perf_counter() - t0
    if sys_.nmi_worker is not None:
        sys_.nmi_worker.flush(timeout=600.0)
        assert not sys_.nmi_worker.errors(), sys_.nmi_worker.errors()[0]
    if sys_.pipeline is not None:
        sys_.pipeline.flush(timeout=600.0)
        assert not sys_.pipeline.errors(), sys_.pipeline.errors()[0]

    # --- per-frame rows: online error vs GT
    rows = []
    for i, r in enumerate(results):
        gt = world.pose_at(i, n_total)
        row = {"i": i}
        if r is None or r.Tcw is None:
            row["state"] = "none"
        else:
            row["state"] = str(r.state).split(".")[-1]
            row["err_m"] = round(
                float(np.linalg.norm(center_of(r.Tcw) - center_of(gt))), 4
            )
            row["inl"] = int(r.n_inliers)
            row["kf"] = bool(r.is_keyframe)
        rows.append(row)

    # --- final recomposed trajectory error (per-frame, with corrections)
    with sys_.map.lock:
        traj = recompose_trajectory(sys_.tracker.trajectory, sys_.map)
        vk = sys_.map.valid_keyframe_indices()
        kf_ids = [int(f) for f in sys_.map.kf_frame_id[vk]]
        nmi_kf_ids = [int(f) for f, a in zip(
            sys_.map.kf_frame_id[vk], sys_.map.kf_nmi_reloc[vk]) if a]
    final_err = {}
    for fid, _t, Tcw, *_ in traj:
        gt = world.pose_at(fid, n_total)
        final_err[int(fid)] = round(
            float(np.linalg.norm(center_of(np.asarray(Tcw)) - center_of(gt))), 4
        )
    for row in rows:
        if row["i"] in final_err:
            row["err_final_m"] = final_err[row["i"]]

    est = [r[2] for r in traj]
    gt_l = [world.pose_at(r[0], n_total) for r in traj]
    ate = ate_rmse(est, gt_l, align=not use_nmi) if est else float("inf")

    with open(out_path, "w") as f:
        for row in rows:
            f.write(json.dumps(row) + "\n")
        f.write(json.dumps({"log": log_rows}) + "\n")

    n_ok = sum(1 for r in results if r is not None and r.Tcw is not None
               and r.state == TrackingState.OK)
    summary = {
        "pipelined": pipelined, "use_nmi": use_nmi, "n_frames": n_frames,
        "n_tracked": n_ok, "n_keyframes": int(sys_.map.n_keyframes),
        "n_kf_valid": int(sys_.map.kf_valid.sum()),
        "ate_rmse": round(float(ate), 4),
        "wall_s": round(wall, 1),
        "kf_frame_ids": kf_ids,
        "nmi_anchor_frame_ids": nmi_kf_ids,
        "out": out_path,
    }
    sys_.shutdown()
    return summary


def main():
    import argparse

    from orbslam2_nmi_tpu.tools.replay_bench import generate_sequence
    from orbslam2_nmi_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--frames", type=int, default=520)
    p.add_argument("--total", type=int, default=None)
    p.add_argument("--pipelined", action="store_true")
    p.add_argument("--no-nmi", action="store_true")
    p.add_argument("--domain-gap", action="store_true")
    p.add_argument("--wide", action="store_true")
    p.add_argument("--out", default="CIRCUIT_DIAG.jsonl")
    args = p.parse_args()
    world, frames = generate_sequence(
        args.frames, n_total=args.total, domain_gap=args.domain_gap,
        circuit="wide" if args.wide else "standard",
    )
    summary = run_diag(
        world, frames, pipelined=args.pipelined, use_nmi=not args.no_nmi,
        threshold=0.1 if args.domain_gap else 0.45, out_path=args.out,
        n_total=args.total or args.frames, domain_gap=args.domain_gap,
    )
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
