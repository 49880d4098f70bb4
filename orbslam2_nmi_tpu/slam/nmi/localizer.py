"""NMI absolute localization against the prior 3-D model.

The TPU-native equivalent of the fork's signature stack: NmiObjects
(Thirdparty/Localization/localization.cpp:82-254) + the Tracking-side control
flow RelocalizeWithNMI / RelocalizeWithNMIStrategy / CalculateNMIRelocalization
(reference: src/Tracking.cc:1851-2179, :2374-2419).

Where the reference walks a 6-deep host loop issuing one OpenGL render and one
CUDA histogram pipeline per pose pair (with a 4-byte D2H sync each,
kernel.cu:100), this implementation evaluates the WHOLE 6-D grid as three
fused device computations per iteration:

    1. warp the camera frame by all rotation hypotheses        (vmapped warp)
    2. render the model at all translation candidates          (vmapped splat)
    3. score all (render x warp) pairs                         (Pallas NMI kernel)

and one [S*R]-float readback. The coarse-to-fine schedule, gain/middle
termination, pose revert and adaptive accept threshold run on the host exactly
as in the reference.

Sign conventions: translation candidates move the camera center along its own
axes, offset_cam = (i - (n-1)/2) * step per axis (x right, y down, z forward);
rotation candidates compose camera-frame R = Rz Ry Rx on the right of Twc.
The reference's GL-frame equivalent uses (left, down, backward) axes for
(x, y, z) offsets (rendering.hpp:644-665) — a fixed sign flip per axis; both
are symmetric centered grids, and render/update consistency is what matters
(verified by the recover-a-known-perturbation tests).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from orbslam2_nmi_tpu.config import CameraConfig, NMIConfig
from orbslam2_nmi_tpu.geometry import se3
from orbslam2_nmi_tpu.io.model_loader import MeshModel
from orbslam2_nmi_tpu.ops import histogram_nmi, homography, raster, render
from orbslam2_nmi_tpu.slam.nmi import search_kernel as sk


@dataclass
class NMIOutcome:
    Tcw: np.ndarray  # final pose (possibly reverted)
    nmi: float  # best NMI score of the last evaluated kernel
    relocalized: bool
    failed: bool
    iterations: int
    previous_poses: list  # Twc before each iteration (mvPreviousPoses parity)
    # per-axis grid sizes of the kernel at exit — the Track() drift reset only
    # clears axes the kernel actually searched (num > 1), Tracking.cc:600-612
    num_synth: tuple = (3, 3, 3)
    num_warp: tuple = (3, 3, 3)


def _box_pool(img: jnp.ndarray, scale: int) -> jnp.ndarray:
    """[H, W] -> [H//s, W//s] average pooling (exact box filter)."""
    h, w = img.shape
    hs, ws = h // scale * scale, w // scale * scale
    return img[:hs, :ws].reshape(hs // scale, scale, ws // scale, scale).mean((1, 3))


def _euler_zyx_matrix(angles: jnp.ndarray) -> jnp.ndarray:
    """R = Rz(az) Ry(ay) Rx(ax) — same composition as the warp homographies
    and CalculateNMIRelocalization (Tracking.cc:2374-2419)."""
    ax, ay, az = angles[0], angles[1], angles[2]
    Rx = se3.so3_exp(jnp.array([1.0, 0.0, 0.0]) * ax)
    Ry = se3.so3_exp(jnp.array([0.0, 1.0, 0.0]) * ay)
    Rz = se3.so3_exp(jnp.array([0.0, 0.0, 1.0]) * az)
    hi = jax.lax.Precision.HIGHEST
    return jnp.matmul(jnp.matmul(Rz, Ry, precision=hi), Rx, precision=hi)


class NMILocalizer:
    """Owns the render model + camera and runs NMI pose-grid searches."""

    def __init__(
        self,
        cfg: NMIConfig,
        camera: CameraConfig,
        model: Optional[render.RenderModel],
        log_fn: Optional[Callable[[str], None]] = None,
        image_scale: int = 1,
        mesh: Optional[MeshModel] = None,
        force_mesh_raster: bool = False,
    ):
        """`model` drives the point-splat path (RENDER_POINT_CLOUD, mode 4);
        passing `mesh` instead selects the tiled triangle rasterizer
        (RENDER_TEXTURE, mode 1 — rendering.hpp:54-55). Either may be None,
        not both."""
        assert model is not None or mesh is not None
        self.cfg = cfg
        self.camera = camera
        # >1 widens the next search's steps (re-init latch widening)
        self.search_scale = 1.0
        self.model = model
        self.mesh = mesh
        if (mesh is not None and model is None and not force_mesh_raster
                and jax.devices()[0].platform != "tpu"):
            # the Pallas rasterizer would run in interpret mode off-TPU (far
            # too slow for full frames) — densely point-sample the mesh once
            # and use the splat renderer instead; same scene, same NMI scores
            # to within sampling noise (tests/test_raster.py)
            self.model = render.model_from_pointcloud(render.mesh_to_points(mesh))
            self.mesh = None
        self.log = log_fn or (lambda s: None)
        # when set, relocalize_once saves best/middle overlay images here
        # (the reference's orb_prop_log imagery, Tracking.cc:1911-1948)
        self.debug_dir: Optional[str] = None
        self._debug_seq = 0
        # NMI operates on (possibly downscaled) full frames; scale 1 = parity
        self.scale = image_scale
        self.height = camera.height // image_scale
        self.width = camera.width // image_scale
        K = camera.K.copy()
        if image_scale != 1:
            K[:2] /= image_scale
        self.K = jnp.asarray(K)
        self.initial_kernel = sk.SearchKernel(
            num_synth=cfg.grid.synth_num,
            num_warp=cfg.grid.warp_num,
            step_synth=cfg.grid.synth_step,
            step_warp=cfg.grid.warp_step,
        )

    # ------------------------------------------------------------------ grid

    def evaluate_grid(
        self, frame_gray: jnp.ndarray, Tcw: jnp.ndarray, kernel: sk.SearchKernel,
        scale: int = 1,
    ) -> np.ndarray:
        """Score the full 6-D grid at pose Tcw. Returns [S, R] numpy scores.

        Equivalent to one RelocalizeWithNMI grid sweep (Tracking.cc:1879-1902)
        fused into three device dispatches. `scale > 1` evaluates at reduced
        resolution (box-pooled camera frame, scaled intrinsics): the mutual
        information statistics are preserved to grid-argmax accuracy while
        render + score cost drops ~scale^2 — used for the coarse iterations
        of the search (the FINAL iteration always runs at full resolution)."""
        offsets = render.translation_grid_offsets(kernel.num_synth, kernel.step_synth)
        angles = homography.rotation_grid_angles(kernel.num_warp, kernel.step_warp)
        h, w = self.height // scale, self.width // scale
        if scale == 1:
            K = self.K
            frame = frame_gray
        else:
            K_np = np.asarray(self.K).copy()
            K_np[:2] /= scale
            K = jnp.asarray(K_np)
            frame = _box_pool(frame_gray, scale)
        if self.mesh is not None:
            # RENDER_TEXTURE: tiled triangle rasterizer, binned per pose (the
            # bin margin covers the whole candidate grid so all S renders
            # share one binning)
            binned = raster.bin_mesh(
                self.mesh,
                np.asarray(Tcw),
                np.asarray(K),
                h,
                w,
                self.cfg.render_near,
                self.cfg.render_far,
                max_offset=np.abs(np.asarray(offsets)).max(axis=0),
            )
            if binned.overflow:
                self.log(f"NMI raster: {binned.overflow} tile-list entries dropped (capacity)")
            synth = raster.render_mesh_grid(
                binned, jnp.asarray(Tcw), K, offsets,
                self.cfg.render_near, self.cfg.render_far,
                interpret=jax.devices()[0].platform != "tpu",
            )
        else:
            synth = render.render_translation_grid(
                self.model,
                jnp.asarray(Tcw),
                K,
                offsets,
                h,
                w,
                self.cfg.render_near,
                self.cfg.render_far,
                point_size=max(1, int(round(self.cfg.render_point_size / (self.scale * scale)))),
            )
        warped = homography.warp_rotation_grid(frame, K, angles)
        scores = histogram_nmi.nmi_scores(
            synth, warped, metric=self.cfg.metric, n_bins=self.cfg.n_bins,
            use_background=self.cfg.use_background,
        )
        return np.asarray(scores)

    # ------------------------------------------------------------- one round

    def relocalize_once(
        self, frame_gray: jnp.ndarray, Tcw: np.ndarray, kernel: sk.SearchKernel,
        scale: int = 1,
    ) -> tuple[np.ndarray, sk.SearchKernel]:
        """One grid evaluation + pose snap to the best cell
        (RelocalizeWithNMI, Tracking.cc:1851-1985)."""
        scores = self.evaluate_grid(frame_gray, Tcw, kernel, scale=scale)
        s_flat, r_flat = np.unravel_index(np.argmax(scores), scores.shape)
        kernel = kernel.with_best_from_flat(int(s_flat), int(r_flat), float(scores[s_flat, r_flat]))
        if self.debug_dir:
            self._save_debug_overlays(frame_gray, Tcw, kernel, scores, int(s_flat), int(r_flat))
        Tcw_new = self._apply_best_cell(Tcw, kernel)
        return Tcw_new, kernel

    def _save_debug_overlays(self, frame_gray, Tcw, kernel, scores, s_best, r_best):
        """Best + middle overlay images with grid metadata in the filename
        (Tracking.cc:1911-1948: red = camera, green = synthetic)."""
        import os

        from orbslam2_nmi_tpu.viz.replay import save_nmi_debug_overlay

        offsets = render.translation_grid_offsets(kernel.num_synth, kernel.step_synth)
        angles = homography.rotation_grid_angles(kernel.num_warp, kernel.step_warp)
        s_mid = len(offsets) // 2
        r_mid = angles.shape[0] // 2
        for tag, s_idx, r_idx in (("best", s_best, r_best), ("middle", s_mid, r_mid)):
            if self.mesh is not None:
                binned = raster.bin_mesh(
                    self.mesh, np.asarray(Tcw), np.asarray(self.K),
                    self.height, self.width, self.cfg.render_near, self.cfg.render_far,
                )
                synth = raster.render_mesh_grid(
                    binned, jnp.asarray(Tcw), self.K, offsets[s_idx : s_idx + 1],
                    self.cfg.render_near, self.cfg.render_far,
                    interpret=jax.devices()[0].platform != "tpu",
                )[0]
            else:
                synth = render.render_pointcloud(
                    self.model,
                    jnp.asarray(Tcw).at[:3, 3].add(-offsets[s_idx]),
                    self.K, self.height, self.width,
                    self.cfg.render_near, self.cfg.render_far,
                    point_size=max(1, int(round(self.cfg.render_point_size / self.scale))),
                )
            warped = homography.warp_rotation_grid(
                frame_gray, self.K, angles[r_idx : r_idx + 1]
            )[0]
            name = (
                f"{self._debug_seq:04d}_{tag}_s{s_idx}_r{r_idx}"
                f"_nmi{float(scores[s_idx, r_idx]):.4f}.png"
            )
            save_nmi_debug_overlay(
                np.asarray(warped), np.asarray(synth), os.path.join(self.debug_dir, name)
            )
        self._debug_seq += 1

    def _apply_best_cell(self, Tcw: np.ndarray, kernel: sk.SearchKernel) -> np.ndarray:
        """CalculateNMIRelocalization (Tracking.cc:2374-2419): compose the best
        warp rotation into Twc and shift the camera center by the best render
        offset (expressed in the ORIGINAL camera axes)."""
        offsets = np.asarray(
            render.translation_grid_offsets(kernel.num_synth, kernel.step_synth)
        )
        nsx, nsy, _ = kernel.num_synth
        bsx, bsy, bsz = kernel.best_synth
        s_flat = (bsz * nsy + bsy) * nsx + bsx
        off_cam = offsets[s_flat]

        angles_r = np.asarray(
            homography.rotation_grid_angles(kernel.num_warp, kernel.step_warp)
        )
        nwx, nwy, _ = kernel.num_warp
        bwx, bwy, bwz = kernel.best_warp
        r_flat = (bwz * nwy + bwy) * nwx + bwx
        R_warp = np.asarray(_euler_zyx_matrix(jnp.asarray(angles_r[r_flat])))

        Twc = np.asarray(se3.se3_inverse(jnp.asarray(Tcw)))
        Twc_new = Twc.copy()
        Twc_new[:3, :3] = Twc[:3, :3] @ R_warp
        Twc_new[:3, 3] = Twc[:3, 3] + Twc[:3, :3] @ off_cam
        return np.asarray(se3.se3_inverse(jnp.asarray(Twc_new)))

    # ------------------------------------------------------------- strategy

    def relocalize_strategy(
        self,
        frame_gray: jnp.ndarray,
        Tcw: np.ndarray,
        dist_since: tuple[float, float, float] = (0.0, 0.0, 0.0),
        rot_since: tuple[float, float, float] = (0.0, 0.0, 0.0),
        initializing: bool = False,
        search_scale: float | None = None,
    ) -> NMIOutcome:
        """Full coarse-to-fine NMI relocalization
        (RelocalizeWithNMIStrategy, Tracking.cc:1987-2179).

        `search_scale` widens the kernel steps for this call only (failure /
        re-init widening). Callers on other threads MUST pass it explicitly
        rather than mutating `self.search_scale` — the attribute remains as a
        single-threaded default (r4 ADVICE: the async worker's temporary
        mutation raced with the tracking thread's re-init path)."""
        cfg = self.cfg
        # --- kernel sizing (Tracking.cc:2001-2070)
        if dist_since[0] > 0.0:
            kernel = sk.initial_kernel_for_drift(
                self.initial_kernel, dist_since, rot_since, cfg.drift_fraction
            )
        elif initializing:
            kernel = sk.initial_kernel_for_init(self.initial_kernel)
        else:
            kernel = dataclasses.replace(self.initial_kernel)
        # re-initialization / failure widening (pure extension over the
        # reference): per-call argument wins, attribute is the legacy default
        scale = (
            search_scale if search_scale is not None
            else getattr(self, "search_scale", 1.0)
        )
        if scale != 1.0:
            kernel = dataclasses.replace(
                kernel,
                step_synth=tuple(s * scale for s in kernel.step_synth),
                step_warp=tuple(s * scale for s in kernel.step_warp),
            )

        # coarse iterations can run at reduced resolution (cfg.coarse_scale
        # > 1): MI argmax over the grid is preserved at ~scale^2 lower render
        # + score cost, and the FINAL full-resolution pass below re-searches
        # the last (smallest-step) grid so the accepted pose and score are
        # always full-resolution quantities
        coarse = max(1, int(getattr(cfg, "coarse_scale", 1)))

        Tcw_save = Tcw.copy()
        Tcw_save_last = Tcw.copy()
        last_nmi = 0.0
        under_threshold = 0
        previous_poses = []
        i = 0
        while True:
            i += 1
            if i > cfg.max_iteration_count:
                break
            previous_poses.append(np.asarray(se3.se3_inverse(jnp.asarray(Tcw))))
            Tcw, kernel = self.relocalize_once(frame_gray, Tcw, kernel, scale=coarse)
            self.log(
                f"NMI iter {i}: nmi={kernel.nmi:.5f} best_s={kernel.best_synth} "
                f"best_w={kernel.best_warp} steps={kernel.step_synth}/{kernel.step_warp}"
                + (f" (1/{coarse} res)" if coarse > 1 else "")
            )
            if (initializing and scale > 1.0
                    and i == 1 and kernel.nmi < 0.5 * cfg.threshold):
                # hopeless RE-init latch — refinement can't recover a 2x miss.
                # Restricted to the widened re-init path (search_scale > 1):
                # on original initialization callers ignore the outcome, so an
                # early abort here would silently anchor the map from the
                # unrefined configured init pose.
                break
            if i > 1 and kernel.is_middle():
                break
            if i > 1:
                gain = kernel.nmi / last_nmi if last_nmi > 0 else float("inf")
                if gain < cfg.gain_epsilon:
                    if under_threshold > 0:
                        break
                    under_threshold += 1
                else:
                    under_threshold = 0
            last_nmi = kernel.nmi
            kernel = kernel.resized()
            Tcw_save_last = Tcw.copy()

        # revert to previous iterate if the last evaluation regressed
        if kernel.nmi < last_nmi:
            Tcw = Tcw_save_last

        if coarse > 1:
            # final pass at FULL resolution over the final kernel: snaps the
            # pose at full-res MI accuracy and produces the authoritative
            # score for the accept gate (coarse scores only steered the
            # search). One extra sweep, shrunk to <=3 cells per axis (+-1
            # final step around the coarse optimum — the coarse phase already
            # localized the cell; re-sweeping a 5-wide init grid at full res
            # would cost 4.6x a normal sweep for nothing).
            fine = dataclasses.replace(
                kernel,
                num_synth=tuple(min(n, 3) for n in kernel.num_synth),
                num_warp=tuple(min(n, 3) for n in kernel.num_warp),
            )
            previous_poses.append(np.asarray(se3.se3_inverse(jnp.asarray(Tcw))))
            Tcw, kernel = self.relocalize_once(frame_gray, Tcw, fine, scale=1)
            self.log(
                f"NMI final (full res): nmi={kernel.nmi:.5f} "
                f"best_s={kernel.best_synth} best_w={kernel.best_warp}"
            )

        # adaptive acceptance (Tracking.cc:2140-2168). Fail safe on any
        # non-finite input: a NaN distance would make every comparison False
        # and silently accept an arbitrarily bad latch.
        distance = float(np.linalg.norm(dist_since))
        if not np.isfinite(distance):
            distance = 0.0  # strictest threshold
        threshold = sk.adaptive_threshold(cfg.threshold, distance)
        if not np.isfinite(kernel.nmi) or kernel.nmi < threshold:
            if initializing:
                self.log(
                    f"NMI INIT REJECTED: nmi={kernel.nmi:.5f} < threshold "
                    f"{threshold:.5f} — init pose NOT refined"
                )
            return NMIOutcome(
                Tcw=Tcw_save,
                nmi=kernel.nmi,
                relocalized=False,
                failed=True,
                iterations=i,
                previous_poses=previous_poses,
                num_synth=kernel.num_synth,
                num_warp=kernel.num_warp,
            )
        return NMIOutcome(
            Tcw=Tcw,
            nmi=kernel.nmi,
            relocalized=True,
            failed=False,
            iterations=i,
            previous_poses=previous_poses,
            num_synth=kernel.num_synth,
            num_warp=kernel.num_warp,
        )
