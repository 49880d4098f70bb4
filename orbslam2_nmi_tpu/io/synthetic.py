"""Synthetic world + sequence generator — the replay-test oracle.

The reference has no automated tests (SURVEY.md §4); its ground truth is
dataset replay. We go further: a procedurally generated 3-D point world is
rendered along a known trajectory with the engine's own splat renderer, so
full-pipeline tests can bound ATE-RMSE against exact ground truth with no
external dataset, and NMI tests can localize against the very model that
generated the imagery (the ideal-case analogue of the ZU-MAV mesh).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from orbslam2_nmi_tpu.geometry import se3


@dataclass
class SyntheticWorld:
    points: np.ndarray  # [P, 3] float32
    gray: np.ndarray  # [P] float32
    fx: float = 260.0

    @staticmethod
    def generate(seed: int = 0, n_points: int = 120_000) -> "SyntheticWorld":
        """A textured undulating ground 'terrain' ~15 m below the camera path,
        with high-frequency blocky texture (rich in FAST corners)."""
        rng = np.random.default_rng(seed)
        x = rng.uniform(-30, 60, n_points)
        y = rng.uniform(-25, 25, n_points)
        z = 15.0 + 2.5 * np.sin(x * 0.35) * np.cos(y * 0.3) + rng.uniform(0, 0.3, n_points)
        pts = np.stack([x, y, z], axis=-1).astype(np.float32)
        gray = (
            (np.floor(x * 1.3) * 53 + np.floor(y * 1.3) * 101 + np.floor(z * 2.0) * 29) % 200
            + 28
        ).astype(np.float32)
        return SyntheticWorld(points=pts, gray=gray)

    def pose_at(self, i: int, n_frames: int) -> np.ndarray:
        """Ground-truth Tcw along a smooth forward path with gentle yaw."""
        import jax.numpy as jnp

        s = i / max(n_frames - 1, 1)
        t = np.array([12.0 * s, 1.5 * np.sin(s * 2.0), 0.0], np.float32)
        yaw = 0.10 * np.sin(s * 3.0)
        pitch = 0.04 * np.sin(s * 2.0)
        R = np.asarray(
            se3.so3_exp(jnp.asarray([pitch, yaw, 0.0], jnp.float32))
        )
        Tcw = np.eye(4, dtype=np.float32)
        Tcw[:3, :3] = R
        Tcw[:3, 3] = -R @ t
        return Tcw

    def camera_K(self, width: int, height: int) -> np.ndarray:
        return np.array(
            [[self.fx, 0, width / 2], [0, self.fx, height / 2], [0, 0, 1]], np.float32
        )

    def render_frame(self, i: int, n_frames: int, width: int, height: int) -> np.ndarray:
        import jax.numpy as jnp

        from orbslam2_nmi_tpu.ops import render

        model = render.RenderModel(points=jnp.asarray(self.points), gray=jnp.asarray(self.gray))
        img = render.render_pointcloud(
            model,
            jnp.asarray(self.pose_at(i, n_frames)),
            jnp.asarray(self.camera_K(width, height)),
            height,
            width,
            near=2.0,
            far=40.0,
            point_size=3,
        )
        return np.clip(np.asarray(img), 0, 255).astype(np.uint8)
