"""Headline benchmark: NMI pose-grid evaluation throughput on one TPU chip.

Measures the engine's hot path (SURVEY.md §3.3): a full NMI relocalization
sweep — 27 translation-candidate renders + 27 rotation warps + 729 pose-pair
NMI scores at full camera resolution (960x540) — end to end on device, and
reports pose-pair evaluations per second.

Baseline derivation (the reference publishes no numbers, BASELINE.md): the
reference needs one relocalization (<= 4 iterations x 729 evals = 2916 evals)
per 2 keyframes; at ~1 keyframe/s that is ~1458 evals/s to keep NMI off the
critical path of the 30 fps pipeline. vs_baseline = value / 1458: >1 means the
NMI stage is faster than real-time needs; each integer multiple is one more
full coarse-to-fine relocalization affordable per keyframe interval.

Output: one JSON line {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from orbslam2_nmi_tpu.ops import histogram_nmi, homography, render

    H, W = 540, 960
    S_GRID = (3, 3, 3)
    R_GRID = (3, 3, 3)
    n_pairs = int(np.prod(S_GRID) * np.prod(R_GRID))

    K = jnp.asarray(np.array([[435.0, 0, 480.0], [0, 435.0, 270.0], [0, 0, 1]], np.float32))
    rng = np.random.default_rng(0)
    n_points = 500_000
    x = rng.uniform(-40, 40, n_points)
    y = rng.uniform(-30, 30, n_points)
    z = 15.0 + 3.0 * np.sin(x * 0.3) * np.cos(y * 0.25)
    pts = np.stack([x, y, z], -1).astype(np.float32)
    gray = ((np.floor(x * 1.1) * 53 + np.floor(y * 1.1) * 101) % 256).astype(np.float32)
    model = render.RenderModel(points=jnp.asarray(pts), gray=jnp.asarray(gray))

    offsets = render.translation_grid_offsets(S_GRID, (0.2, 0.2, 0.5))
    angles = homography.rotation_grid_angles(R_GRID, (0.02, 0.02, 0.05))
    use_pallas = jax.devices()[0].platform == "tpu"

    @jax.jit
    def nmi_sweep(frame_gray, Tcw):
        synth = render.render_translation_grid(model, Tcw, K, offsets, H, W, 5.0, 30.0, 3)
        warped = homography.warp_rotation_grid(frame_gray, K, angles)
        scores = histogram_nmi.nmi_scores(synth, warped, use_pallas=use_pallas)
        return scores, jnp.argmax(scores)

    frame = jnp.asarray(rng.uniform(0, 255, (H, W)).astype(np.float32))
    Tcw = jnp.eye(4, dtype=jnp.float32)

    # Device-only timing: loop sweeps inside one jit so the per-call host<->
    # device round-trip (70 ms over the axon tunnel) doesn't pollute the
    # number; one readback at the end forces execution.
    n_runs = 5

    @jax.jit
    def many(frame, Tcw):
        def body(i, acc):
            scores, best = nmi_sweep(frame + 0.0 * i, Tcw)
            return acc + scores
        return jax.lax.fori_loop(0, n_runs, body, jnp.zeros((len(offsets), len(angles))))

    np.asarray(many(frame, Tcw))  # warmup/compile
    t0 = time.perf_counter()
    np.asarray(many(frame, Tcw))
    dt = (time.perf_counter() - t0) / n_runs

    evals_per_s = n_pairs / dt
    baseline_evals_per_s = 1458.0  # see module docstring
    print(
        json.dumps(
            {
                "metric": "nmi_pose_evals_per_s",
                "value": round(evals_per_s, 1),
                "unit": "pose-pair NMI evaluations/s (960x540, incl. render+warp)",
                "vs_baseline": round(evals_per_s / baseline_evals_per_s, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
