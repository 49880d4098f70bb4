"""Tiled mesh rasterizer tests (ops/raster.py) — run on CPU in interpret mode.

Covers: binning conservativeness, analytic coverage/depth of a textured quad,
z-buffer ordering of overlapping triangles, agreement with the point-splat
renderer on a dense height-field mesh, and the translation-grid batch path.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from orbslam2_nmi_tpu.io.model_loader import MeshModel
from orbslam2_nmi_tpu.ops import raster, render

H, W = 48, 256  # multiples of the 16x128 tile
K = np.array([[100.0, 0, 128.0], [0, 100.0, 24.0], [0, 0, 1]], np.float32)


def quad_mesh(z=5.0, size=4.0, gray_tl=200.0, gray_br=40.0):
    """Two triangles forming a textured square centered on the optical axis."""
    s = size / 2
    verts = np.array(
        [[-s, -s, z], [s, -s, z], [s, s, z], [-s, s, z]], np.float32
    )
    uvs = np.array([[0, 1], [1, 1], [1, 0], [0, 0]], np.float32)
    faces = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    tex = np.full((8, 8), gray_tl, np.float32)
    tex[4:, 4:] = gray_br
    return MeshModel(vertices=verts, uvs=uvs, faces=faces, texture_gray=tex)


def render_one(mesh, Tcw=np.eye(4, dtype=np.float32), offsets=None, near=1.0, far=50.0):
    if offsets is None:
        offsets = jnp.zeros((1, 3), jnp.float32)
    binned = raster.bin_mesh(
        mesh, Tcw, K, H, W, near, far,
        max_offset=float(np.linalg.norm(np.asarray(offsets), axis=-1).max()),
    )
    img = raster.render_mesh_grid(
        binned, jnp.asarray(Tcw), jnp.asarray(K), jnp.asarray(offsets),
        near, far, interpret=True,
    )
    return np.asarray(img), binned


def test_quad_coverage_and_texture():
    """The quad covers exactly its projected bbox; texture grays land on the
    correct image quadrants (GL v-flip semantics)."""
    img, binned = render_one(quad_mesh())
    assert binned.overflow == 0
    # projected quad: x in [128 +- 100*2/5] = [88, 168], y in [24 +- 40]
    inside = img[0, 10:38, 90:166]
    assert (inside > 0).all(), "interior pixels must be covered"
    assert img[0, 2, 2] == 0.0, "background stays empty"
    # uv (0,1)=top-left of world quad maps texture row 0 (gray_tl=200);
    # bottom-right quadrant of the quad shows gray_br=40
    # two-hot matmul sampler runs in bf16: tolerance +-0.5 gray
    assert abs(img[0, 6, 92] - 200.0) < 0.5
    assert abs(img[0, 40, 164] - 40.0) < 0.5


def test_depth_ordering_two_quads():
    """A nearer triangle wins the z-buffer against a farther one."""
    near_q = quad_mesh(z=4.0, size=2.0, gray_tl=10.0, gray_br=10.0)
    far_q = quad_mesh(z=10.0, size=8.0, gray_tl=250.0, gray_br=250.0)
    mesh = MeshModel(
        vertices=np.concatenate([near_q.vertices, far_q.vertices]),
        uvs=np.concatenate([near_q.uvs, far_q.uvs]),
        faces=np.concatenate([near_q.faces, far_q.faces + 4]),
        texture_gray=np.full((8, 8), 10.0, np.float32),  # both sample same tex
    )
    # distinct grays via textures is shared here; distinguish by uv: use the
    # gray from per-quad textures instead -> render each separately and check
    # the composite equals the near quad where it covers.
    img_near, _ = render_one(near_q)
    img_far, _ = render_one(far_q)
    img_both, _ = render_one(
        MeshModel(
            vertices=mesh.vertices, uvs=mesh.uvs, faces=mesh.faces,
            texture_gray=near_q.texture_gray,
        )
    )
    covered_near = img_near[0] > 0
    # where the near quad covers, the composite must show the near surface
    np.testing.assert_allclose(img_both[0][covered_near], img_near[0][covered_near], atol=0.5)


def test_matches_pointsplat_on_heightfield():
    """Dense height-field mesh: rasterized gray ~= densely point-sampled splat
    (the two renderers implement the same scene)."""
    rng = np.random.default_rng(0)
    n = 24
    xs = np.linspace(-8, 8, n)
    ys = np.linspace(-4, 4, n)
    X, Y = np.meshgrid(xs, ys, indexing="xy")
    Z = 10.0 + 0.5 * np.sin(X) * np.cos(Y)
    verts = np.stack([X.ravel(), Y.ravel(), Z.ravel()], -1).astype(np.float32)
    uvs = np.stack(
        [(X.ravel() - xs[0]) / (xs[-1] - xs[0]), (Y.ravel() - ys[0]) / (ys[-1] - ys[0])], -1
    ).astype(np.float32)
    faces = []
    for i in range(n - 1):
        for j in range(n - 1):
            a, b, c, d = i * n + j, i * n + j + 1, (i + 1) * n + j + 1, (i + 1) * n + j
            faces += [[a, b, c], [a, c, d]]
    faces = np.asarray(faces, np.int32)
    tex = rng.uniform(20, 235, (16, 16)).astype(np.float32)
    # smooth the texture so bilinear (raster) vs nearest (splat sampling)
    # differences stay small
    for _ in range(2):
        tex = 0.25 * (np.roll(tex, 1, 0) + np.roll(tex, -1, 0) + np.roll(tex, 1, 1) + np.roll(tex, -1, 1))
    mesh = MeshModel(vertices=verts, uvs=uvs, faces=faces, texture_gray=tex)

    img_r, binned = render_one(mesh)
    pc = render.mesh_to_points(mesh, samples_per_unit_area=600.0)
    img_s = np.asarray(
        render.render_pointcloud(
            render.model_from_pointcloud(pc), jnp.eye(4), jnp.asarray(K), H, W, 1.0, 50.0, 3
        )
    )
    cov_r = img_r[0] > 0
    cov_s = img_s > 0
    both = cov_r & cov_s
    assert both.sum() > 2000
    # coverage agreement (splat bleeds ~1px via its 3x3 point size)
    iou = both.sum() / (cov_r | cov_s).sum()
    assert iou > 0.9
    diff = np.abs(img_r[0][both] - img_s[both])
    assert np.median(diff) < 12.0


def test_translation_grid_batch_shifts_image():
    """Candidate offsets along camera x shift the rendered quad in -x pixels
    (camera moves right => scene moves left), batched in one call."""
    offsets = jnp.asarray([[0.0, 0, 0], [0.5, 0, 0]], jnp.float32)
    img, _ = render_one(quad_mesh(), offsets=offsets)
    cols0 = np.nonzero(img[0].sum(0))[0]
    cols1 = np.nonzero(img[1].sum(0))[0]
    shift = cols1.mean() - cols0.mean()
    # expected: -fx * 0.5 / z = -100*0.5/5 = -10 px
    assert abs(shift + 10.0) < 1.5


def test_localizer_mesh_path_recovers_translation():
    """End-to-end NMI relocalization through the MESH raster path: a one-step
    translation perturbation snaps back (same contract as the point-splat
    localizer tests in test_nmi.py)."""
    from orbslam2_nmi_tpu.config import CameraConfig, NMIConfig, NMIGridConfig
    from orbslam2_nmi_tpu.slam.nmi.localizer import NMILocalizer

    rng = np.random.default_rng(3)
    n = 40
    xs = np.linspace(-12, 12, n)
    ys = np.linspace(-6, 6, n)
    X, Y = np.meshgrid(xs, ys, indexing="xy")
    Z = 10.0 + 0.8 * np.sin(X * 0.9) * np.cos(Y * 1.1)
    verts = np.stack([X.ravel(), Y.ravel(), Z.ravel()], -1).astype(np.float32)
    uvs = np.stack(
        [(X.ravel() - xs[0]) / (xs[-1] - xs[0]), (Y.ravel() - ys[0]) / (ys[-1] - ys[0])], -1
    ).astype(np.float32)
    faces = []
    for i in range(n - 1):
        for j in range(n - 1):
            a, b, c, d = i * n + j, i * n + j + 1, (i + 1) * n + j + 1, (i + 1) * n + j
            faces += [[a, b, c], [a, c, d]]
    mesh = MeshModel(
        vertices=verts, uvs=uvs, faces=np.asarray(faces, np.int32),
        texture_gray=rng.uniform(10, 245, (64, 64)).astype(np.float32),
    )
    cam = CameraConfig(fx=100.0, fy=100.0, cx=128.0, cy=24.0, width=W, height=H)
    cfg = NMIConfig(
        grid=NMIGridConfig(
            synth_num=(3, 1, 1), warp_num=(1, 1, 1),
            synth_step=(0.4, 0.4, 0.4), warp_step=(0.03, 0.03, 0.03),
        ),
        render_near=1.0, render_far=50.0, render_point_size=3.0, threshold=0.05,
        max_iteration_count=2,
    )
    loc = NMILocalizer(cfg, cam, None, mesh=mesh, force_mesh_raster=True)
    assert loc.mesh is not None, "mesh raster path must stay active"
    T_true = np.eye(4, dtype=np.float32)
    cam_img, _ = render_one(mesh, near=1.0, far=50.0)
    T_pert = T_true.copy()
    T_pert[:3, 3] += np.array([0.4, 0.0, 0.0], np.float32)
    out = loc.relocalize_strategy(jnp.asarray(cam_img[0]), T_pert, initializing=False)
    e0 = np.linalg.norm((np.linalg.inv(T_true) @ T_pert)[:3, 3])
    e1 = np.linalg.norm((np.linalg.inv(T_true) @ out.Tcw)[:3, 3])
    assert out.relocalized
    assert e1 < 0.5 * e0, (e0, e1)


def test_windowed_sampler_matches_whole_texture():
    """The per-tile windowed texture sampler must agree exactly with the
    whole-texture two-hot-matmul sampler (same math, restricted operand)."""
    rng = np.random.default_rng(11)
    n = 24
    xs = np.linspace(-3, 3, n)
    X, Y = np.meshgrid(xs, xs, indexing="xy")
    Z = 6.0 + 0.5 * np.sin(X) * np.cos(Y)
    verts = np.stack([X.ravel(), Y.ravel(), Z.ravel()], -1).astype(np.float32)
    uvs = np.stack(
        [(X.ravel() + 3) / 6, (Y.ravel() + 3) / 6], -1
    ).astype(np.float32)
    ii, jj = np.meshgrid(np.arange(n - 1), np.arange(n - 1), indexing="ij")
    a = (ii * n + jj).ravel()
    faces = np.concatenate(
        [np.stack([a, a + 1, a + n + 1], -1), np.stack([a, a + n + 1, a + n], -1)]
    ).astype(np.int32)
    tex = rng.uniform(0, 255, (300, 300)).astype(np.float32)
    mesh = MeshModel(vertices=verts, uvs=uvs, faces=faces, texture_gray=tex)
    Tcw = np.eye(4, dtype=np.float32)
    offsets = jnp.zeros((1, 3), jnp.float32)
    b = raster.bin_mesh(mesh, Tcw, K, H, W, 1.0, 50.0, max_offset=0.0)
    assert b.tex_origin is not None and b.tex_win >= 128, "window path must engage"
    i_win = np.asarray(
        raster.render_mesh_grid(b, Tcw, jnp.asarray(K), offsets, 1.0, 50.0, interpret=True)
    )
    i_full = np.asarray(
        raster.render_mesh_grid(
            b._replace(tex_origin=None, tex_win=0), Tcw, jnp.asarray(K), offsets,
            1.0, 50.0, interpret=True,
        )
    )
    np.testing.assert_array_equal(i_win, i_full)


def test_binning_margin_covers_grid():
    """With a max_offset margin, every candidate's coverage is inside binned
    tiles (no clipped coverage at tile borders): render with the offset both
    via the batch path and via re-binning at the moved pose — equal images."""
    mesh = quad_mesh()
    off = np.array([[0.4, 0.2, 0.0]], np.float32)
    img_batch, _ = render_one(mesh, offsets=jnp.asarray(off))
    Tcw2 = np.eye(4, dtype=np.float32)
    Tcw2[:3, 3] = -off[0]
    img_rebin, _ = render_one(mesh, Tcw=Tcw2)
    np.testing.assert_allclose(img_batch[0], img_rebin[0], atol=0.5)


def test_batched_render_frames_matches_single():
    """SyntheticMeshWorld.render_frames batches uploads across frames but the
    output must be POSE-EXACT per frame: the r4 version reused the last
    frame's per-tile texture-window origins for the whole batch, which
    clipped texels for every other frame (screen-tile-anchored artifacts
    jumping at 16-frame batch boundaries — the seed of the far-arc drift).
    Batched rendering must be pixel-identical to single-frame rendering."""
    from orbslam2_nmi_tpu.io.synthetic import SyntheticMeshWorld

    world = SyntheticMeshWorld.generate(seed=1, n_grid=48)
    ids = [0, 200, 400]
    batched = world.render_frames(ids, 520, 256, 48, batch=3)
    for j, i in enumerate(ids):
        single = world.render_frames([i], 520, 256, 48, batch=1)
        assert np.array_equal(batched[j], single[0]), f"frame {i} differs"
