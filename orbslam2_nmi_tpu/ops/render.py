"""Offscreen rendering of the prior 3-D model — no OpenGL, pure XLA.

TPU-native replacement for Rendering<mode> (reference:
Thirdparty/Localization/rendering.hpp:64-759: hidden GLFW window + FBO with a
GL_RED texture, GLSL shaders, one draw call per translation candidate).
Design:

  * **Point-splat with a fused z-buffer**: each point's depth and gray value
    pack into one sortable int32 key (quantized depth in the high bits, gray in
    the low byte); a single scatter-min IS the depth test. GL_POINTS with
    glPointSize(3) becomes a 3x3 min-pool of the key image (nearest-depth
    wins in the neighborhood, same as point sprites under GL_LESS).
  * **Textured meshes are densely point-sampled at load time** (barycentric
    samples with texture grays), then rendered by the same splat path — a
    deliberate TPU-first substitute for triangle rasterization (no texture
    units / depth hardware on TPU; a tiled Pallas rasterizer can replace this
    without touching callers). Sample density is chosen from the mesh area so
    splats stay hole-free at the configured point size.
  * The whole translation grid renders **batched** (vmap over candidate camera
    centers) — the reference loops renderToTextureOnGPU per candidate
    (rendering.hpp:530-630, Tracking.cc:1882).

Camera-frame translation offsets follow calculateTranslation semantics
(rendering.hpp:644-665): the candidate grid moves the camera center along its
own right/up/forward axes; with Tcw = [R|t], an offset `o` in camera axes is
simply t' = t - o.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from orbslam2_nmi_tpu.geometry import se3
from orbslam2_nmi_tpu.io.model_loader import MeshModel, PointCloudModel

_BIG = jnp.int32(2**30)
_DEPTH_LEVELS = 2**22


class RenderModel(NamedTuple):
    """Device-resident renderable: world points + gray intensities [0, 255]."""

    points: jnp.ndarray  # [P, 3] float32
    gray: jnp.ndarray  # [P] float32


def model_from_pointcloud(pc: PointCloudModel) -> RenderModel:
    return RenderModel(points=jnp.asarray(pc.points), gray=jnp.asarray(pc.gray))


def mesh_to_points(
    mesh: MeshModel, samples_per_unit_area: float = 400.0, max_points: int = 4_000_000, seed: int = 0
) -> PointCloudModel:
    """Densely sample a textured mesh into a colored pointcloud (host-side,
    once at load). Per-face sample count is proportional to face area."""
    v = mesh.vertices
    f = mesh.faces
    p0, p1, p2 = v[f[:, 0]], v[f[:, 1]], v[f[:, 2]]
    cross = np.cross(p1 - p0, p2 - p0)
    area = 0.5 * np.linalg.norm(cross, axis=-1)
    n_samples = np.maximum((area * samples_per_unit_area).astype(np.int64), 1)
    total = int(n_samples.sum())
    if total > max_points:
        scale = max_points / total
        n_samples = np.maximum((n_samples * scale).astype(np.int64), 1)
        total = int(n_samples.sum())

    face_idx = np.repeat(np.arange(len(f)), n_samples)
    rng = np.random.default_rng(seed)
    r1 = np.sqrt(rng.uniform(size=total)).astype(np.float32)
    r2 = rng.uniform(size=total).astype(np.float32)
    w0 = 1.0 - r1
    w1 = r1 * (1.0 - r2)
    w2 = r1 * r2
    pts = (
        w0[:, None] * p0[face_idx]
        + w1[:, None] * p1[face_idx]
        + w2[:, None] * p2[face_idx]
    )
    uv = (
        w0[:, None] * mesh.uvs[f[face_idx, 0]]
        + w1[:, None] * mesh.uvs[f[face_idx, 1]]
        + w2[:, None] * mesh.uvs[f[face_idx, 2]]
    )
    th, tw = mesh.texture_gray.shape
    # GL-style UV: v=0 at texture bottom
    tx = np.clip((uv[:, 0] * (tw - 1)).round().astype(np.int64), 0, tw - 1)
    ty = np.clip(((1.0 - uv[:, 1]) * (th - 1)).round().astype(np.int64), 0, th - 1)
    gray = mesh.texture_gray[ty, tx]
    return PointCloudModel(points=pts.astype(np.float32), gray=gray.astype(np.float32))


def _min_pool(key_img: jnp.ndarray, size: int) -> jnp.ndarray:
    if size <= 1:
        return key_img
    return jax.lax.reduce_window(
        key_img,
        np.int32(2**30),
        jax.lax.min,
        window_dimensions=(size, size),
        window_strides=(1, 1),
        padding="SAME",
    )


def render_pointcloud(
    model: RenderModel,
    Tcw: jnp.ndarray,
    K: jnp.ndarray,
    height: int,
    width: int,
    near: float,
    far: float,
    point_size: int = 3,
    background: float = 0.0,
) -> jnp.ndarray:
    """Render [H, W] float32 grayscale with z-buffering (GL_LESS semantics)."""
    pc = se3.se3_apply(Tcw, model.points)
    z = pc[:, 2]
    z_safe = jnp.where(z > 1e-6, z, 1e-6)
    u = K[0, 0] * pc[:, 0] / z_safe + K[0, 2]
    v = K[1, 1] * pc[:, 1] / z_safe + K[1, 2]
    ui = jnp.round(u).astype(jnp.int32)
    vi = jnp.round(v).astype(jnp.int32)
    ok = (z > near) & (z < far) & (ui >= 0) & (ui < width) & (vi >= 0) & (vi < height)

    zq = jnp.clip(
        ((z - near) / (far - near) * _DEPTH_LEVELS).astype(jnp.int32), 0, _DEPTH_LEVELS - 1
    )
    g8 = jnp.clip(model.gray, 0, 255).astype(jnp.int32)
    key = zq * 256 + g8
    key = jnp.where(ok, key, _BIG)
    pix = jnp.where(ok, vi * width + ui, 0)

    buf = jnp.full((height * width,), _BIG, jnp.int32).at[pix].min(key)
    # pixel 0 may have collected masked-out points' sentinel writes only; the
    # sentinel equals the empty value so no correction is needed.
    img_key = _min_pool(buf.reshape(height, width), point_size)
    return jnp.where(img_key < _BIG, (img_key % 256).astype(jnp.float32), background)


@functools.partial(jax.jit, static_argnums=(4, 5, 6, 7, 8))
def render_translation_grid(
    model: RenderModel,
    Tcw: jnp.ndarray,
    K: jnp.ndarray,
    offsets_cam: jnp.ndarray,  # [S, 3] camera-axis offsets of the camera center
    height: int,
    width: int,
    near: float,
    far: float,
    point_size: int = 3,
) -> jnp.ndarray:
    """Render every translation candidate: [S, H, W] float32, one fused dispatch."""

    def one(off):
        T = Tcw.at[:3, 3].add(-off)
        return render_pointcloud(model, T, K, height, width, near, far, point_size)

    return jax.vmap(one)(offsets_cam)


def translation_grid_offsets(
    synth_num: tuple[int, int, int], synth_step: tuple[float, float, float]
) -> jnp.ndarray:
    """[S, 3] camera-axis offsets, centered grid; index s = (sz*ny + sy)*nx + sx
    (matches the rating-array layout localization.cpp:185-210)."""
    nx, ny, nz = synth_num
    sx, sy, sz = synth_step
    ox = (jnp.arange(nx) - (nx - 1) / 2.0) * sx
    oy = (jnp.arange(ny) - (ny - 1) / 2.0) * sy
    oz = (jnp.arange(nz) - (nz - 1) / 2.0) * sz
    OZ, OY, OX = jnp.meshgrid(oz, oy, ox, indexing="ij")
    return jnp.stack([OX.reshape(-1), OY.reshape(-1), OZ.reshape(-1)], axis=-1)
