"""Synthetic world + sequence generator — the replay-test oracle.

The reference has no automated tests (SURVEY.md §4); its ground truth is
dataset replay. We go further: a procedurally generated 3-D point world is
rendered along a known trajectory with the engine's own splat renderer, so
full-pipeline tests can bound ATE-RMSE against exact ground truth with no
external dataset, and NMI tests can localize against the very model that
generated the imagery (the ideal-case analogue of the ZU-MAV mesh).
"""

from __future__ import annotations

from dataclasses import dataclass, field

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


def terrain_mesh(seed: int = 0, n: int = 190, extent=(40.0, 30.0), base_z: float = 15.0,
                 relief: float = 3.0, marks: int = 0):
    """Textured undulating height-field mesh: 2(n-1)^2 triangles with a
    multi-scale random-block 512x512 texture — piecewise-constant regions give
    descriptors that are REPEATABLE under sub-pixel view shifts (per-texel
    white noise decorrelates rBRIEF between frames), while block edges at
    three scales (~0.6 m / 1.25 m / 5 m on the ground) supply FAST corners
    across the whole pyramid. The same family of mesh feeds the NMI benchmark,
    so the sequence oracle and the NMI prior model are the same kind of object
    (the ideal-case analogue of the reference's ZU-MAV photogrammetry OBJ)."""
    from orbslam2_nmi_tpu.io.model_loader import MeshModel

    rng = np.random.default_rng(seed)
    ex, ey = extent
    xs = np.linspace(-ex, ex, n)
    ys = np.linspace(-ey, ey, n)
    X, Y = np.meshgrid(xs, ys, indexing="xy")
    Z = base_z + relief * np.sin(X * 0.3) * np.cos(Y * 0.25)
    verts = np.stack([X.ravel(), Y.ravel(), Z.ravel()], -1).astype(np.float32)
    uvs = np.stack(
        [(X.ravel() + ex) / (2 * ex), (Y.ravel() + ey) / (2 * ey)], -1
    ).astype(np.float32)
    ii, jj = np.meshgrid(np.arange(n - 1), np.arange(n - 1), indexing="ij")
    a = (ii * n + jj).ravel()
    b, c, d = a + 1, a + n + 1, a + n
    faces = np.concatenate(
        [np.stack([a, b, c], -1), np.stack([a, c, d], -1)]
    ).astype(np.int32)

    def _blocks(n_block: int, amp: float) -> np.ndarray:
        r = rng.uniform(0, amp, (n_block, n_block))
        return np.kron(r, np.ones((512 // n_block, 512 // n_block)))

    tex = (15.0 + _blocks(128, 95) + _blocks(64, 75) + _blocks(16, 60)).clip(10, 245)
    if marks:
        # distinctive landmarks: random rotated elliptical patches that break
        # the axis-aligned block texture's self-similarity — without them
        # every FAST corner is a block corner and place recognition aliases
        # across the whole terrain (loop-closure candidates become noise)
        # small (a,b <= ~4 texels): big uniform blobs would starve FAST of
        # corners in mark-dense views and break tracking outright
        yy, xx = np.mgrid[0:512, 0:512].astype(np.float32)
        for _ in range(marks):
            cx, cy = rng.uniform(10, 502, 2)
            a, b = rng.uniform(1.2, 4.0, 2)
            th = rng.uniform(0, np.pi)
            g = rng.uniform(0, 255)
            dx, dy = xx - cx, yy - cy
            u = dx * np.cos(th) + dy * np.sin(th)
            v = -dx * np.sin(th) + dy * np.cos(th)
            inside = (u / a) ** 2 + (v / b) ** 2 < 1.0
            tex[inside] = g
        tex = tex.clip(10, 245)
    return MeshModel(vertices=verts, uvs=uvs, faces=faces,
                     texture_gray=tex.astype(np.float32))


@dataclass
class SyntheticMeshWorld:
    """Long-sequence oracle: a textured terrain mesh imaged along a CLOSED
    circuit that revisits its start (loop-closure ground truth), rendered with
    the engine's own tiled rasterizer (ops/raster.py) — so tracking, place
    recognition, loop closing AND the NMI mesh path are all exercised against
    exact ground truth (the analogue of a ZU-MAV-style aerial survey loop)."""

    mesh: object
    fx: float = 450.0
    radius_x: float = 12.0
    radius_y: float = 8.0
    overlap: float = 0.10  # fraction of the circuit re-traversed at the end

    @staticmethod
    def generate(seed: int = 0, n_grid: int = 190) -> "SyntheticMeshWorld":
        return SyntheticMeshWorld(mesh=terrain_mesh(seed=seed, n=n_grid))

    @staticmethod
    def generate_wide(seed: int = 0, n_grid: int = 190) -> "SyntheticMeshWorld":
        """Loop-closure variant: a LARGE circuit under a NARROWER field of
        view (fx=700 -> ~+-10 m ground footprint at 15 m altitude vs a
        32x18 m ellipse), so opposite arcs of the circuit see DISJOINT
        terrain and the revisit at the end is a true loop closure — on the
        standard circuit the footprint covers the whole ellipse and every
        keyframe stays covisible with every other (nothing for LoopClosing
        to do). Radii/focal chosen to keep per-frame optical flow ~7 px so
        the standard matching windows hold."""
        return SyntheticMeshWorld(
            mesh=terrain_mesh(seed=seed, n=n_grid, marks=500),
            fx=700.0, radius_x=16.0, radius_y=9.0, overlap=0.15,
        )

    def camera_K(self, width: int, height: int) -> np.ndarray:
        return np.array(
            [[self.fx, 0, width / 2], [0, self.fx, height / 2], [0, 0, 1]], np.float32
        )

    def pose_at(self, i: int, n_frames: int) -> np.ndarray:
        """Tcw on an elliptical closed circuit at z=0 looking down (+z) at the
        terrain, with gentle yaw/pitch wobble and a vertical swell. The last
        `overlap` fraction of frames re-traverses the start arc."""
        s = i / max(n_frames - 1, 1)
        th = 2.0 * np.pi * s * (1.0 + self.overlap)
        t = np.array(
            [
                self.radius_x * np.sin(th),
                self.radius_y * (1.0 - np.cos(th)),
                0.6 * np.sin(3.0 * th),
            ],
            np.float32,
        )
        yaw = 0.08 * np.sin(2.0 * th)
        pitch = 0.05 * np.sin(th + 0.7)
        import jax.numpy as jnp

        R = np.asarray(se3.so3_exp(jnp.asarray([pitch, yaw, 0.0], jnp.float32)))
        Tcw = np.eye(4, dtype=np.float32)
        Tcw[:3, :3] = R
        Tcw[:3, 3] = -R @ t
        return Tcw

    def render_frames(self, frame_ids, n_frames: int, width: int, height: int,
                      batch: int = 16) -> np.ndarray:
        """Render frames [len(frame_ids), H, W] u8 via the mesh rasterizer.

        Each frame is binned (host) and rendered at its own exact pose; to
        amortize the host<->device round trips the per-frame tile lists are
        uploaded as one stacked array per `batch` frames and the rendered u8
        frames fetched as one stacked array per batch."""
        import jax
        import jax.numpy as jnp

        from orbslam2_nmi_tpu.ops import raster

        K = self.camera_K(width, height)
        near, far = self.near_far()
        out = np.zeros((len(frame_ids), height, width), np.uint8)
        zero = jnp.zeros((1, 3), jnp.float32)
        for b0 in range(0, len(frame_ids), batch):
            ids = list(frame_ids[b0 : b0 + batch])
            poses, binned_list = [], []
            for i in ids:
                T = self.pose_at(i, n_frames)
                binned = raster.bin_mesh(
                    self.mesh, T, K, height, width, near, far, capacity_floor=384,
                    capacity_cap=384, device_arrays=False,
                )
                # the fixed 384 capacity keeps every frame the same compiled
                # shape; silently dropped triangles would punch holes in the
                # ground-truth imagery the ATE harness trusts, so overflow is
                # a hard error (raise the cap if a denser mesh ever trips it)
                if binned.overflow:
                    raise ValueError(
                        f"bin_mesh dropped {binned.overflow} triangles at "
                        f"frame {i} (tile capacity 384 exceeded)"
                    )
                poses.append(T)
                binned_list.append(binned)
            # Batch-COMMON texture-window side with per-frame ORIGINS. The
            # r4 version reused the last frame's BinnedMesh wholesale (only
            # tri_data swapped): its pose-specific tex_origin windows then
            # clipped texels for every other frame of the batch — screen-
            # tile-anchored artifacts, consistent within a batch and jumping
            # at batch boundaries, which biased the tracked pose chain and
            # seeded the far-arc drift. Ground-truth imagery must be
            # pose-exact: windows are recomputed per frame against one
            # shared (max) side so the whole batch still compiles once.
            wins = [b.tex_win for b in binned_list]
            use_win = min(wins) > 0
            origins = []
            if use_win:
                win = max(wins)
                for b in binned_list:
                    o = np.asarray(b.tex_origin) if b.tex_win == win else None
                    if o is None:
                        o, w2 = raster._tile_texture_windows(
                            b.tri_data, b.texture.shape, b.tex_hw, force_win=win
                        )
                        if o is None:
                            use_win = False
                            break
                    origins.append(o)
            stacked = jax.device_put(
                np.stack([b.tri_data for b in binned_list])
            )  # one upload per batch
            if b0 == 0:
                tex_dev = jax.device_put(binned_list[0].texture)
            org_stacked = (
                jax.device_put(np.stack(origins)) if use_win else None
            )
            imgs = [
                raster.render_mesh_grid(
                    binned_list[j]._replace(
                        tri_data=stacked[j],
                        texture=tex_dev,
                        tex_origin=org_stacked[j] if use_win else None,
                        tex_win=win if use_win else 0,
                    ),
                    poses[j], K, zero, near, far, interpret=_not_tpu(), out_u8=True,
                )[0]
                for j in range(len(ids))
            ]
            out[b0 : b0 + len(ids)] = np.asarray(jnp.stack(imgs))  # one fetch
        return out

    @staticmethod
    def near_far() -> tuple:
        return 4.0, 45.0

    def lit_mesh(self, sun=(0.45, 0.30, 0.85), ambient: float = 0.30):
        """A photometrically DIVERGENT copy of the terrain mesh: the texture is
        modulated by Lambertian terrain shading from a sun direction.

        This manufactures the reference's core operating condition — live
        camera imagery and the prior model texture NEVER match photometrically
        (README.md:1-76: photogrammetry texture vs a different day's flight) —
        inside the synthetic oracle: camera frames are rendered from THIS
        shaded mesh while the NMI prior keeps the flat texture. The height
        field's planar UV makes the light map bakeable per-texel (UV <-> world
        x,y is a bijection, terrain_mesh uvs)."""
        mesh = self.mesh
        th, tw = mesh.texture_gray.shape
        n = int(np.sqrt(len(mesh.vertices)))
        Z = mesh.vertices[:, 2].reshape(n, n)  # [y, x] (meshgrid indexing=xy)
        X = mesh.vertices[:, 0].reshape(n, n)
        Y = mesh.vertices[:, 1].reshape(n, n)
        dzdx = np.gradient(Z, X[0, :], axis=1)
        dzdy = np.gradient(Z, Y[:, 0], axis=0)
        nrm = np.stack([-dzdx, -dzdy, np.ones_like(Z)], -1)
        nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True)
        sun = np.asarray(sun, np.float64)
        sun = sun / np.linalg.norm(sun)
        light = ambient + (1.0 - ambient) * np.clip(nrm @ sun, 0.0, None)
        # vertex-grid light -> texel grid: u ~ x (cols), v ~ y; texture row 0
        # is v=1 (GL flip in the sampler), i.e. y=+ey -> flip rows
        li = np.clip(
            _bilinear_resize(light[::-1, :], th, tw), 0.0, 1.2
        )
        tex = np.clip(mesh.texture_gray * li, 0.0, 255.0).astype(np.float32)
        import dataclasses as _dc

        return _dc.replace(mesh, texture_gray=tex)


def _bilinear_resize(a: np.ndarray, h: int, w: int) -> np.ndarray:
    """Plain-numpy separable bilinear resize of a 2-D array."""
    ys = np.linspace(0, a.shape[0] - 1, h)
    xs = np.linspace(0, a.shape[1] - 1, w)
    y0 = np.clip(ys.astype(np.int64), 0, a.shape[0] - 2)
    x0 = np.clip(xs.astype(np.int64), 0, a.shape[1] - 2)
    ay = (ys - y0)[:, None]
    ax = (xs - x0)[None, :]
    r0 = a[y0][:, x0] * (1 - ax) + a[y0][:, x0 + 1] * ax
    r1 = a[y0 + 1][:, x0] * (1 - ax) + a[y0 + 1][:, x0 + 1] * ax
    return r0 * (1 - ay) + r1 * ay


def apply_photometric_gap(frames: np.ndarray, seed: int = 0,
                          noise_sigma: float = 4.0, gamma: float = 1.25,
                          vignette: float = 0.35) -> np.ndarray:
    """Screen-space camera-degradation stack applied to rendered frames:
    smooth per-frame exposure drift, radial vignette, gamma, sensor noise.
    Composed with the lit-mesh rendering this gives camera imagery that no
    longer matches the flat prior texture photometrically — the condition the
    NMI metric (vs SSD/NCC) exists for (reference NMI.cu:230-363)."""
    rng = np.random.default_rng(seed)
    n, h, w = frames.shape
    yy, xx = np.meshgrid(
        np.linspace(-1, 1, h), np.linspace(-1, 1, w), indexing="ij"
    )
    vig = 1.0 - vignette * np.clip(xx * xx + yy * yy, 0.0, 1.0)
    t = np.arange(n) / max(n - 1, 1)
    gain = 0.8 + 0.4 * np.sin(2.5 * np.pi * t + 0.7) * 0.5 + 0.1 * t
    out = np.empty_like(frames)
    for i in range(n):
        f = frames[i].astype(np.float32) / 255.0
        f = np.clip(f * gain[i] * vig, 0.0, 1.0) ** gamma
        f = f * 255.0 + rng.normal(0.0, noise_sigma, (h, w))
        out[i] = np.clip(f, 0, 255).astype(frames.dtype)
    return out


def _not_tpu() -> bool:
    import jax

    return jax.devices()[0].platform not in ("tpu", "axon")
