import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orbslam2_nmi_tpu.geometry import se3
from orbslam2_nmi_tpu.solvers import two_view_init

K = np.array([[400.0, 0, 320], [0, 400.0, 240], [0, 0, 1]], np.float32)


def project(T, pts):
    pc = pts @ T[:3, :3].T + T[:3, 3]
    return (pc[:, :2] / pc[:, 2:3] * [K[0, 0], K[1, 1]] + [K[0, 2], K[1, 2]]).astype(np.float32)


def run_init(pts, T2, seed=0, outlier_frac=0.0):
    rng = np.random.default_rng(seed)
    T1 = np.eye(4, dtype=np.float32)
    uv1, uv2 = project(T1, pts), project(T2, pts)
    n_out = int(outlier_frac * len(pts))
    if n_out:
        uv2[:n_out] += rng.uniform(30, 60, (n_out, 2)).astype(np.float32)
    return two_view_init.initialize_two_view(
        jax.random.PRNGKey(seed), jnp.asarray(K), jnp.asarray(uv1), jnp.asarray(uv2),
        jnp.ones(len(pts), bool),
    )


def relative_direction_error(T_est, T_true):
    t_e = T_est[:3, 3] / max(np.linalg.norm(T_est[:3, 3]), 1e-9)
    t_t = T_true[:3, 3] / max(np.linalg.norm(T_true[:3, 3]), 1e-9)
    return float(np.arccos(np.clip(abs(np.dot(t_e, t_t)), -1, 1)))


def test_general_scene_selects_fundamental():
    rng = np.random.default_rng(1)
    pts = np.stack(
        [rng.uniform(-4, 4, 150), rng.uniform(-3, 3, 150), rng.uniform(5, 15, 150)], -1
    ).astype(np.float32)
    T2 = np.asarray(se3.se3_exp(jnp.asarray([0.8, 0.05, 0.1, 0.02, -0.04, 0.01], jnp.float32)))
    res = run_init(pts, T2)
    assert bool(res.ok)
    assert not bool(res.used_homography)  # 3-D scene -> fundamental wins
    T_est = np.asarray(res.Tcw2)
    R_err = np.asarray(se3.so3_log(jnp.asarray(T_est[:3, :3] @ T2[:3, :3].T)))
    assert np.abs(R_err).max() < 0.02
    assert relative_direction_error(T_est, T2) < 0.05
    # triangulated points match scene up to the monocular scale
    inl = np.asarray(res.inliers)
    assert inl.sum() > 100
    scale = np.median(np.asarray(res.points_w)[inl][:, 2] / pts[inl][:, 2])
    np.testing.assert_allclose(
        np.asarray(res.points_w)[inl] / scale, pts[inl], atol=0.3
    )


def test_planar_scene_selects_homography():
    rng = np.random.default_rng(2)
    pts = np.stack(
        [rng.uniform(-4, 4, 150), rng.uniform(-3, 3, 150), np.full(150, 10.0)], -1
    ).astype(np.float32)
    T2 = np.asarray(se3.se3_exp(jnp.asarray([0.6, 0.0, 0.0, 0.0, -0.03, 0.0], jnp.float32)))
    res = run_init(pts, T2)
    assert bool(res.used_homography)  # planar scene -> homography wins
    if bool(res.ok):
        T_est = np.asarray(res.Tcw2)
        assert relative_direction_error(T_est, T2) < 0.1


def test_handles_outliers():
    rng = np.random.default_rng(3)
    pts = np.stack(
        [rng.uniform(-4, 4, 200), rng.uniform(-3, 3, 200), rng.uniform(5, 15, 200)], -1
    ).astype(np.float32)
    T2 = np.asarray(se3.se3_exp(jnp.asarray([0.7, 0.0, 0.0, 0.0, 0.02, 0.0], jnp.float32)))
    res = run_init(pts, T2, outlier_frac=0.2)
    assert bool(res.ok)
    assert relative_direction_error(np.asarray(res.Tcw2), T2) < 0.05
    assert not np.asarray(res.inliers)[:20].any()
