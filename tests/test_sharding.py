"""Multi-device tests on the virtual 8-device CPU mesh (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orbslam2_nmi_tpu.ops import histogram_nmi, homography, render
from orbslam2_nmi_tpu.parallel import mesh as mesh_lib
from orbslam2_nmi_tpu.parallel import sharded_ba, sharded_nmi
from orbslam2_nmi_tpu.solvers import local_ba

from tests.test_ba import make_ba_problem, reproj_rmse, K


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) >= 8, "conftest must force 8 virtual cpu devices"
    return mesh_lib.make_mesh(8)


def test_sharded_ba_matches_single_device(mesh8):
    prob, cams_true, _ = make_ba_problem(seed=4)
    res_single = local_ba.bundle_adjust(prob)
    res_shard = sharded_ba.sharded_bundle_adjust(mesh8, prob)
    # same convergence quality (not bit-equal: psum reassociation)
    r1 = reproj_rmse(K, res_single.cam_Tcw, res_single.pts_w, prob)
    r2 = reproj_rmse(K, res_shard.cam_Tcw, res_shard.pts_w, prob)
    assert r2 < max(2 * r1, 0.05), (r1, r2)
    np.testing.assert_allclose(
        np.asarray(res_shard.cam_Tcw), np.asarray(res_single.cam_Tcw), atol=5e-3
    )


def test_sharded_ba_fixed_cameras_pinned(mesh8):
    prob, _, _ = make_ba_problem(seed=5)
    res = sharded_ba.sharded_bundle_adjust(mesh8, prob)
    np.testing.assert_array_equal(np.asarray(res.cam_Tcw[:2]), np.asarray(prob.cam_Tcw[:2]))


def test_sharded_nmi_matches_single_device(mesh8):
    rng = np.random.default_rng(0)
    n = 30000
    pts = np.stack(
        [rng.uniform(-15, 15, n), rng.uniform(-10, 10, n), rng.uniform(8, 20, n)], -1
    ).astype(np.float32)
    gray = ((np.floor(pts[:, 0]) * 37 + np.floor(pts[:, 1]) * 91) % 256).astype(np.float32)
    model = render.RenderModel(points=jnp.asarray(pts), gray=jnp.asarray(gray))
    Kc = jnp.asarray(np.array([[120.0, 0, 80], [0, 120.0, 60], [0, 0, 1]], np.float32))
    Tcw = jnp.eye(4)
    offsets = render.translation_grid_offsets((3, 3, 3), (0.3, 0.3, 0.3))
    angles = homography.rotation_grid_angles((3, 3, 3), (0.03, 0.03, 0.03))
    frame = render.render_pointcloud(model, Tcw, Kc, 120, 160, 1.0, 30.0, 3)

    mesh = mesh_lib.make_mesh(8)
    scores_sharded = sharded_nmi.sharded_nmi_search(
        mesh, model, frame, Tcw, offsets, angles, Kc, 120, 160, 1.0, 30.0,
        use_pallas=False,
    )
    # single-device reference
    synth = render.render_translation_grid(model, Tcw, Kc, offsets, 120, 160, 1.0, 30.0, 3)
    warped = homography.warp_rotation_grid(frame, Kc, angles)
    scores_ref = histogram_nmi.nmi_scores(synth, warped, use_pallas=False)
    np.testing.assert_allclose(
        np.asarray(scores_sharded), np.asarray(scores_ref), atol=1e-4
    )
    # and the best cell is the aligned center
    assert int(np.argmax(np.asarray(scores_sharded))) == 13 * 27 + 13


def test_pad_to_multiple():
    x = jnp.ones((5, 3))
    y = sharded_nmi.pad_to_multiple(x, 8, axis=0, fill=7.0)
    assert y.shape == (8, 3)
    assert float(y[5, 0]) == 7.0


def test_sharded_nmi_mesh_matches_single_device(mesh8):
    """Mesh-raster sharded NMI (the reference's default render mode) matches
    the single-device raster + score path and peaks at the aligned center."""
    from orbslam2_nmi_tpu.io.model_loader import MeshModel
    from orbslam2_nmi_tpu.ops import raster

    rng = np.random.default_rng(5)
    n = 30
    xs = np.linspace(-15, 15, n)
    ys = np.linspace(-10, 10, n)
    X, Y = np.meshgrid(xs, ys, indexing="xy")
    Z = 12.0 + 1.0 * np.sin(X * 0.7) * np.cos(Y * 0.9)
    verts = np.stack([X.ravel(), Y.ravel(), Z.ravel()], -1).astype(np.float32)
    uvs = np.stack(
        [(X.ravel() - xs[0]) / 30.0, (Y.ravel() - ys[0]) / 20.0], -1
    ).astype(np.float32)
    ii, jj = np.meshgrid(np.arange(n - 1), np.arange(n - 1), indexing="ij")
    a = (ii * n + jj).ravel()
    faces = np.concatenate(
        [np.stack([a, a + 1, a + n + 1], -1), np.stack([a, a + n + 1, a + n], -1)]
    ).astype(np.int32)
    mesh_model = MeshModel(
        vertices=verts, uvs=uvs, faces=faces,
        texture_gray=rng.uniform(10, 245, (64, 64)).astype(np.float32),
    )
    H, W = 48, 128
    K_np = np.array([[60.0, 0, 64], [0, 60.0, 24], [0, 0, 1]], np.float32)
    offsets = render.translation_grid_offsets((2, 2, 2), (0.3, 0.3, 0.3))
    angles = homography.rotation_grid_angles((2, 2, 1), (0.03, 0.03, 0.03))
    binned = raster.bin_mesh(
        mesh_model, np.eye(4, dtype=np.float32), K_np, H, W, 1.0, 30.0,
        max_offset=(0.3, 0.3, 0.3),
    )
    frame = raster.render_mesh_grid(
        binned, np.eye(4, dtype=np.float32), K_np, jnp.zeros((1, 3)), 1.0, 30.0,
        interpret=True,
    )[0]

    mesh = mesh_lib.make_mesh(8)
    scores_sharded = sharded_nmi.sharded_nmi_search_mesh(
        mesh, binned, frame, jnp.eye(4), offsets, angles, K_np, 1.0, 30.0,
        use_pallas=False,
    )
    synth = raster.render_mesh_grid(
        binned, np.eye(4, dtype=np.float32), K_np, offsets, 1.0, 30.0, interpret=True
    )
    warped = homography.warp_rotation_grid(frame, jnp.asarray(K_np), angles)
    scores_ref = histogram_nmi.nmi_scores(synth, warped, use_pallas=False)
    np.testing.assert_allclose(
        np.asarray(scores_sharded), np.asarray(scores_ref), atol=1e-4
    )


def test_sharded_pose_graph_matches_single_device(mesh8):
    """Edge-sharded essential-graph optimization == single-device result
    (psum reassociation tolerance), including non-multiple-of-D edge counts."""
    from orbslam2_nmi_tpu.geometry import se3
    from orbslam2_nmi_tpu.parallel import sharded_pose_graph
    from orbslam2_nmi_tpu.solvers import pose_graph

    V = 10
    gt = [
        np.asarray(se3.se3_exp(jnp.asarray([0.5 * i, 0, 0, 0, 0, 0], jnp.float32)))
        for i in range(V)
    ]
    est = [gt[0]]
    for i in range(1, V):
        rel = gt[i] @ np.linalg.inv(gt[i - 1])
        bias = np.asarray(
            se3.se3_exp(jnp.asarray([0.02, 0.01, 0.0, 0.0, 0.004, 0.0], jnp.float32))
        )
        est.append(bias @ rel @ est[i - 1])
    est = np.stack(est)
    edge_i = list(range(V - 1)) + [0]
    edge_j = list(range(1, V)) + [V - 1]
    meas = [est[i + 1] @ np.linalg.inv(est[i]) for i in range(V - 1)]
    meas.append(gt[V - 1] @ np.linalg.inv(gt[0]))
    prob = pose_graph.PoseGraphProblem(
        Scw=jnp.asarray(est),
        fixed=jnp.asarray(np.arange(V) == 0),
        valid=jnp.ones(V, bool),
        edge_i=jnp.asarray(edge_i, jnp.int32),
        edge_j=jnp.asarray(edge_j, jnp.int32),
        edge_Sji=jnp.asarray(np.stack(meas).astype(np.float32)),
        edge_valid=jnp.ones(len(meas), bool),
    )
    assert len(edge_i) % 8 != 0  # exercises the edge padding path
    single = np.asarray(pose_graph.optimize_pose_graph(prob, iters=10))
    shard = np.asarray(
        sharded_pose_graph.sharded_optimize_pose_graph(mesh8, prob, iters=10)
    )
    np.testing.assert_allclose(shard, single, atol=1e-4)
