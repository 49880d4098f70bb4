"""Per-subsystem DEVICE-time budget of the full replay, from a profiler trace.

The honest answer to "does the whole pipeline fit 33 ms/frame on-chip?": run
the real replay (tracking + NMI + local BA + fuse + loop closing, exactly the
code path bench.py reports) under `jax.profiler.trace`, then aggregate the
TPU plane's "XLA Modules" events — every compiled program the device actually
executed, with its measured on-device duration — into subsystem buckets.
Unlike summing microbenchmarks, this counts every dispatch the pipeline
really made (including recompiles, small host-triggered ops, and the async
workers' overlapped work), and unlike wall clock it excludes the dev-rig's
host<->device tunnel latency (~30-100 ms/round-trip) that a co-located
deployment would not pay.

Output: one JSON dict {subsystem: device_ms_total}, plus per-frame ms and the
wall fps of the same run for contrast. The analogous evaluation in the
reference is mono_ETH.cc:107-151 (per-frame wall timing on an in-chassis GPU,
where device and wall coincide).
"""

from __future__ import annotations

import collections
import glob
import json
import os
import re
import tempfile

# module-name substring -> subsystem bucket (first match wins)
BUCKETS = [
    ("fused_step", "tracking_fused_step"),
    ("jit_step", "tracking_fused_step"),  # fused_track.make_fused_step's jit
    ("extract", "orb_extraction"),
    ("pyramid", "orb_extraction"),
    ("rasterize", "nmi_render"),
    ("sample_texture", "nmi_render"),
    ("gather_windows", "nmi_render"),
    ("render", "nmi_render"),
    ("warp", "nmi_warp"),
    ("entropy", "nmi_score"),
    ("bundle_adjust", "bundle_adjustment"),
    ("solve_structure", "bundle_adjustment"),
    ("pose_optimization", "pose_optimization"),
    ("pose_graph", "pose_graph"),
    ("sim3", "loop_closing"),
    ("match", "matching"),
    ("triangulate", "local_mapping"),
    ("fuse", "local_mapping"),
    ("epipolar", "local_mapping"),
    ("pnp", "relocalization"),
    ("word", "place_recognition"),
    ("vocab", "place_recognition"),
]


def classify(name: str) -> str:
    n = name.lower()
    for sub, bucket in BUCKETS:
        if sub in n:
            return bucket
    return "other"


def parse_device_module_times(trace_dir: str) -> dict:
    """{module_name: seconds} summed over the TPU plane's XLA Modules line."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    files = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True)
    totals: dict = collections.defaultdict(float)
    for f in files:
        xs = xplane_pb2.XSpace()
        with open(f, "rb") as fh:
            xs.ParseFromString(fh.read())
        for plane in xs.planes:
            if not plane.name.startswith("/device:TPU"):
                continue
            meta = {mid: m.name for mid, m in plane.event_metadata.items()}
            for line in plane.lines:
                if line.name != "XLA Modules":
                    continue
                for ev in line.events:
                    name = meta.get(ev.metadata_id, "?")
                    # strip the compilation fingerprint suffix: "name(1234...)"
                    name = re.sub(r"\(\d+\)$", "", name)
                    totals[name] += ev.duration_ps / 1e12
    return dict(totals)


def budget_from_module_times(mod_times: dict, n_frames: int) -> dict:
    buckets: dict = collections.defaultdict(float)
    for name, sec in mod_times.items():
        buckets[classify(name)] += sec
    total = sum(buckets.values())
    out = {
        "device_s_total": round(total, 3),
        "device_ms_per_frame": round(total / max(n_frames, 1) * 1e3, 2),
        "fits_33ms_per_frame": bool(total / max(n_frames, 1) <= 0.033),
        "by_subsystem_ms": {
            k: round(v * 1e3, 1)
            for k, v in sorted(buckets.items(), key=lambda kv: -kv[1])
        },
    }
    return out


def run(n_frames: int = 160, n_total: int = 520, width: int = 960,
        height: int = 540, pipelined: bool = True, trace_dir: str = None) -> dict:
    from orbslam2_nmi_tpu.tools import replay_bench

    import jax

    world, frames = replay_bench.generate_sequence(
        n_frames, width, height, n_total=n_total
    )
    # warm pass so compile time and cold caches stay out of the traced run
    replay_bench.run_replay(
        world, frames[: min(48, n_frames)], use_nmi=True, async_mapping=True,
        n_total=n_total, pipelined=pipelined,
    )
    trace_dir = trace_dir or tempfile.mkdtemp(prefix="device_budget_")
    with jax.profiler.trace(trace_dir):
        out = replay_bench.run_replay(
            world, frames, use_nmi=True, async_mapping=True, n_total=n_total,
            pipelined=pipelined, warmup=0,
        )
    mod = parse_device_module_times(trace_dir)
    budget = budget_from_module_times(mod, n_frames)
    budget["n_frames"] = n_frames
    budget["wall_fps"] = round(out["fps_steady"], 2)
    budget["ate_rmse_m"] = round(out["ate_rmse"], 4)
    budget["n_keyframes"] = out["n_keyframes"]
    budget["n_nmi_anchors"] = out.get("n_nmi_anchors")
    budget["top_modules_ms"] = {
        k: round(v * 1e3, 1)
        for k, v in sorted(mod.items(), key=lambda kv: -kv[1])[:12]
    }
    return budget


def run_windowed(n_frames: int = 160, window_start: int = 60,
                 n_total: int = 520, width: int = 960, height: int = 540,
                 trace_dir: str = None) -> dict:
    """MEASURED steady-state budget: trace ONLY frames [window_start,
    n_frames) of a single continuous replay — the init NMI chains and
    two-view bootstrap stay outside the trace window, so the per-frame
    number is a measurement over the post-init regime, not an amortization
    estimate (r4 VERDICT: '32 vs 33 ms is too close to call by
    extrapolation'). Async mapping/NMI work triggered by the window is
    drained INSIDE the trace so its device time is charged to the window.
    Also reports genuine per-frame wall-latency percentiles for the window
    (frontend completion-time deltas)."""
    import time

    import jax
    import numpy as np

    from orbslam2_nmi_tpu.slam.frontend_pipelined import PipelinedFrontend
    from orbslam2_nmi_tpu.tools import replay_bench

    world, frames = replay_bench.generate_sequence(
        n_frames, width, height, n_total=n_total
    )
    # warm pass: compiles + caches out of the traced run
    replay_bench.run_replay(
        world, frames[: min(48, n_frames)], use_nmi=True, async_mapping=True,
        n_total=n_total, pipelined=True,
    )
    sys_ = replay_bench.build_system(world, width, height)
    sys_.set_init_poses(
        world.pose_at(0, n_total), world.pose_at(sys_.cfg.nmi.offset, n_total)
    )
    fe = PipelinedFrontend(sys_)
    ts = np.arange(n_frames) / 30.0
    fe.run(frames[:window_start], ts[:window_start], start_id=0)
    # drain init-era async work so it is not charged to the window
    sys_.pipeline.flush(timeout=600.0)
    sys_.nmi_worker.flush(timeout=600.0)
    trace_dir = trace_dir or tempfile.mkdtemp(prefix="device_budget_w_")
    t0 = time.perf_counter()
    with jax.profiler.trace(trace_dir):
        fe.run(frames[window_start:], ts[window_start:], start_id=window_start)
        sys_.pipeline.flush(timeout=600.0)
        sys_.nmi_worker.flush(timeout=600.0)
    wall = time.perf_counter() - t0
    n_win = n_frames - window_start
    mod = parse_device_module_times(trace_dir)
    budget = budget_from_module_times(mod, n_win)
    walls = [fe.completion_walls[f] for f in sorted(fe.completion_walls)
             if f >= window_start]
    d = np.diff(np.asarray(walls))
    budget.update({
        "window": [window_start, n_frames],
        "wall_fps_window": round(n_win / wall, 2),
        "frame_ms_p50": round(float(np.median(d)) * 1e3, 1),
        "frame_ms_p95": round(float(np.quantile(d, 0.95)) * 1e3, 1),
        "frame_ms_max": round(float(d.max()) * 1e3, 1),
        "n_keyframes": int(sys_.map.n_keyframes),
        "n_nmi_anchors": int(
            np.sum(sys_.map.kf_nmi_reloc[sys_.map.valid_keyframe_indices()])
        ),
        "top_modules_ms": {
            k: round(v * 1e3, 1)
            for k, v in sorted(mod.items(), key=lambda kv: -kv[1])[:12]
        },
    })
    sys_.shutdown()
    return budget


def main():
    import argparse

    from orbslam2_nmi_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--frames", type=int, default=160)
    p.add_argument("--total", type=int, default=520)
    p.add_argument("--classic", action="store_true")
    p.add_argument("--window", type=int, default=None, metavar="START",
                   help="measured steady-state mode: trace only frames "
                        "[START, --frames) of one continuous replay")
    args = p.parse_args()
    if args.window is not None:
        print(json.dumps(run_windowed(args.frames, args.window, args.total),
                         indent=2))
    else:
        print(json.dumps(
            run(args.frames, args.total, pipelined=not args.classic), indent=2
        ))


if __name__ == "__main__":
    main()
