"""Ground-truth binding audit of the fused front-end — far-arc drift probe.

For every fused frame in a window, audits the (feature px, map point)
bindings against EXACT ground truth: the synthetic terrain height is analytic
(io/synthetic.terrain_mesh: z = base + relief*sin(0.3x)*cos(0.25y)), so each
feature pixel's true 3-D point is recoverable by ray-casting from the
ground-truth camera pose. Separates the three competing explanations of a
pose jump:

  * map deformation  -> bound map points sit far from the features' true 3-D
                        points, CONSISTENTLY (median displacement grows);
  * wrong association -> a subpopulation of bindings with LARGE displacement
                        while the median stays small;
  * solver jump       -> bindings are fine (small displacement) but the pose
                        still lands off GT.

Runs the pipelined front-end with SYNCHRONOUS mapping for determinism.
"""

from __future__ import annotations

import json

import numpy as np


def terrain_height(x, y, base_z=15.0, relief=3.0):
    return base_z + relief * np.sin(x * 0.3) * np.cos(y * 0.25)


def raycast_terrain(Twc_center, dirs_w):
    """Intersect world-frame rays with the analytic height field.
    dirs_w [N, 3] normalized-ish; fixed-point in t: z0 + t*dz = h(x0+t*dx, ...)."""
    o = Twc_center
    t = (15.0 - o[2]) / dirs_w[:, 2]
    for _ in range(12):
        p = o[None, :] + t[:, None] * dirs_w
        h = terrain_height(p[:, 0], p[:, 1])
        t = (h - o[2]) / dirs_w[:, 2]
    return o[None, :] + t[:, None] * dirs_w


def main():
    import argparse

    from orbslam2_nmi_tpu.slam.frontend_pipelined import PipelinedFrontend
    from orbslam2_nmi_tpu.tools.replay_bench import build_system, generate_sequence
    from orbslam2_nmi_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--frames", type=int, default=300)
    p.add_argument("--total", type=int, default=520)
    p.add_argument("--probe-from", type=int, default=240)
    p.add_argument("--use-nmi", action="store_true")
    p.add_argument("--out", default="/tmp/fused_probe.jsonl")
    args = p.parse_args()

    world, frames = generate_sequence(args.frames, n_total=args.total)
    n_frames, height, width = frames.shape
    sys_ = build_system(
        world, width, height, use_nmi=args.use_nmi, async_mapping=False,
        async_nmi=False,
    )
    sys_.set_init_poses(
        world.pose_at(0, args.total), world.pose_at(sys_.cfg.nmi.offset, args.total)
    )
    K = world.camera_K(width, height)
    Kinv = np.linalg.inv(K)
    out_f = open(args.out, "w")

    def center_of(T):
        return -T[:3, :3].T @ T[:3, 3]

    def hook(fid, frame, u):
        if fid < args.probe_from:
            return
        gt = world.pose_at(fid, args.total)
        bound = (frame.mp_idx >= 0) & ~frame.outlier
        idxs = np.nonzero(bound)[0]
        row = {"i": fid}
        Tcw = frame.Tcw
        row["err_m"] = round(float(np.linalg.norm(center_of(Tcw) - center_of(gt))), 4)
        row["n_bound"] = int(len(idxs))
        row["n1"] = u.n_matches1
        row["inl"] = u.n_inliers
        if len(idxs):
            with sys_.map.lock:
                pmap = sys_.map.mp_pos[frame.mp_idx[idxs]].copy()
            # GT 3-D point for each bound feature: ray from GT camera center
            px = np.concatenate([frame.xy[idxs], np.ones((len(idxs), 1))], -1)
            dirs_c = (Kinv @ px.T).T
            Rwc = gt[:3, :3].T
            dirs_w = (Rwc @ dirs_c.T).T
            o = center_of(gt)
            pgt = raycast_terrain(o, dirs_w)
            d = np.linalg.norm(pmap - pgt, axis=-1)
            row["disp_p50"] = round(float(np.median(d)), 4)
            row["disp_p90"] = round(float(np.quantile(d, 0.9)), 4)
            row["frac_gt_15cm"] = round(float((d > 0.15).mean()), 3)
            row["frac_gt_40cm"] = round(float((d > 0.40).mean()), 3)
            # reprojection residual of the bound points under the GT pose:
            # if small, the data was consistent and the solver is at fault
            pc = (gt[:3, :3] @ pgt.T).T + gt[:3, 3]
            pm = (gt[:3, :3] @ pmap.T).T + gt[:3, 3]
            prj = lambda pc: np.stack(
                [K[0, 0] * pc[:, 0] / pc[:, 2] + K[0, 2],
                 K[1, 1] * pc[:, 1] / pc[:, 2] + K[1, 2]], -1)
            res_map = np.linalg.norm(prj(pm) - frame.xy[idxs], axis=-1)
            row["reproj_gtpose_p50"] = round(float(np.median(res_map)), 3)
            row["reproj_gtpose_p90"] = round(float(np.quantile(res_map, 0.9)), 3)
        out_f.write(json.dumps(row) + "\n")
        out_f.flush()

    fe = PipelinedFrontend(sys_)
    fe.debug_hook = hook
    ts = np.arange(n_frames) / 30.0
    results = fe.run(frames, ts, start_id=0)
    n_ok = sum(1 for r in results if r is not None and r.Tcw is not None)
    print(json.dumps({
        "n_tracked": n_ok, "n_keyframes": int(sys_.map.n_keyframes),
        "out": args.out,
    }))
    out_f.close()
    sys_.shutdown()


if __name__ == "__main__":
    main()
