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


def main():
    import argparse

    from orbslam2_nmi_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--frames", type=int, default=160)
    p.add_argument("--total", type=int, default=520)
    p.add_argument("--classic", action="store_true")
    args = p.parse_args()
    print(json.dumps(run(args.frames, args.total, pipelined=not args.classic), indent=2))


if __name__ == "__main__":
    main()
