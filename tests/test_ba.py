import jax.numpy as jnp
import numpy as np

from orbslam2_nmi_tpu.geometry import se3
from orbslam2_nmi_tpu.ops import triangulate
from orbslam2_nmi_tpu.solvers import local_ba

K = np.array([[400.0, 0, 320], [0, 400.0, 240], [0, 0, 1]], np.float32)


def make_ba_problem(n_cams=6, n_pts=300, seed=0, pose_noise=0.02, pt_noise=0.05, fix_first_two=True):
    rng = np.random.default_rng(seed)
    pts = np.stack(
        [rng.uniform(-5, 5, n_pts), rng.uniform(-4, 4, n_pts), rng.uniform(8, 16, n_pts)],
        axis=-1,
    ).astype(np.float32)
    cams_true = []
    for i in range(n_cams):
        xi = np.array([0.4 * i, 0.02 * i, 0.0, 0.0, 0.01 * i, 0.0], np.float32)
        cams_true.append(np.asarray(se3.se3_exp(jnp.asarray(xi))))
    cams_true = np.stack(cams_true)

    obs_cam, obs_pt, obs_uv = [], [], []
    for c in range(n_cams):
        pc = pts @ cams_true[c, :3, :3].T + cams_true[c, :3, 3]
        uv = pc[:, :2] / pc[:, 2:3] * [K[0, 0], K[1, 1]] + [K[0, 2], K[1, 2]]
        vis = (pc[:, 2] > 0.5) & (uv[:, 0] > 0) & (uv[:, 0] < 640) & (uv[:, 1] > 0) & (uv[:, 1] < 480)
        for p in np.nonzero(vis)[0]:
            obs_cam.append(c)
            obs_pt.append(p)
            obs_uv.append(uv[p])
    O = len(obs_cam)

    cams0 = cams_true.copy()
    for c in range(2 if fix_first_two else 0, n_cams):
        xi_n = rng.normal(0, pose_noise, 6).astype(np.float32)
        cams0[c] = np.asarray(se3.se3_compose(se3.se3_exp(jnp.asarray(xi_n)), jnp.asarray(cams0[c])))
    pts0 = pts + rng.normal(0, pt_noise, pts.shape).astype(np.float32)

    fixed = np.zeros(n_cams, bool)
    if fix_first_two:
        fixed[:2] = True

    prob = local_ba.BAProblem(
        K=jnp.asarray(K),
        cam_Tcw=jnp.asarray(cams0),
        cam_fixed=jnp.asarray(fixed),
        cam_valid=jnp.ones(n_cams, bool),
        pts_w=jnp.asarray(pts0),
        pts_valid=jnp.ones(n_pts, bool),
        obs_cam=jnp.asarray(obs_cam, jnp.int32),
        obs_pt=jnp.asarray(obs_pt, jnp.int32),
        obs_uv=jnp.asarray(np.asarray(obs_uv, np.float32)),
        obs_inv_sigma2=jnp.ones(O, jnp.float32),
        obs_valid=jnp.ones(O, bool),
    )
    return prob, cams_true, pts


def reproj_rmse(K, cams, pts, prob):
    r, _, _, z = local_ba._residuals(
        jnp.asarray(K), cams, pts, prob.obs_cam, prob.obs_pt, prob.obs_uv
    )
    return float(jnp.sqrt(jnp.mean(jnp.sum(r * r, axis=-1))))


def test_ba_converges_to_ground_truth():
    prob, cams_true, pts_true = make_ba_problem()
    res = local_ba.bundle_adjust(prob)
    rmse0 = reproj_rmse(K, prob.cam_Tcw, prob.pts_w, prob)
    rmse1 = reproj_rmse(K, res.cam_Tcw, res.pts_w, prob)
    assert rmse1 < 0.05, (rmse0, rmse1)
    # free cameras recover truth
    for c in range(2, 6):
        err = np.asarray(
            se3.se3_log(jnp.asarray(np.linalg.inv(cams_true[c]) @ np.asarray(res.cam_Tcw[c])))
        )
        assert np.abs(err).max() < 2e-3, (c, err)


def test_ba_fixed_cameras_unmoved():
    prob, _, _ = make_ba_problem()
    res = local_ba.bundle_adjust(prob)
    np.testing.assert_array_equal(np.asarray(res.cam_Tcw[:2]), np.asarray(prob.cam_Tcw[:2]))


def test_ba_gates_outlier_observations():
    prob, _, _ = make_ba_problem(seed=1)
    uv = np.array(prob.obs_uv)
    uv[:20] += 50.0  # corrupt 20 observations
    prob = prob._replace(obs_uv=jnp.asarray(uv))
    res = local_ba.bundle_adjust(prob)
    inl = np.asarray(res.obs_inlier)
    assert not inl[:20].any()
    assert inl[20:].mean() > 0.95


def test_ba_respects_point_validity():
    prob, _, _ = make_ba_problem(seed=2)
    pv = np.ones(prob.pts_w.shape[0], bool)
    pv[::3] = False
    prob = prob._replace(pts_valid=jnp.asarray(pv))
    res = local_ba.bundle_adjust(prob)
    # invalid points must not move
    np.testing.assert_array_equal(
        np.asarray(res.pts_w)[~pv], np.asarray(prob.pts_w)[~pv]
    )


# ---------------------------------------------------------------- triangulation


def test_triangulate_recovers_points():
    rng = np.random.default_rng(0)
    pts = np.stack(
        [rng.uniform(-3, 3, 50), rng.uniform(-2, 2, 50), rng.uniform(6, 12, 50)], axis=-1
    ).astype(np.float32)
    T1 = np.eye(4, dtype=np.float32)
    T2 = np.asarray(se3.se3_exp(jnp.asarray([1.0, 0.0, 0.0, 0.0, 0.05, 0.0], jnp.float32)))

    def proj(T):
        pc = pts @ T[:3, :3].T + T[:3, 3]
        return pc[:, :2] / pc[:, 2:3] * [K[0, 0], K[1, 1]] + [K[0, 2], K[1, 2]]

    res = triangulate.triangulate_and_gate(
        jnp.asarray(K),
        jnp.asarray(T1),
        jnp.asarray(T2),
        jnp.asarray(proj(T1).astype(np.float32)),
        jnp.asarray(proj(T2).astype(np.float32)),
        jnp.ones(50),
        jnp.ones(50),
        jnp.ones(50, bool),
    )
    assert np.asarray(res.valid).all()
    np.testing.assert_allclose(np.asarray(res.points_w), pts, atol=2e-2)


def test_triangulate_rejects_low_parallax():
    pts = np.array([[0.0, 0.0, 10.0]], np.float32)
    T1 = np.eye(4, dtype=np.float32)
    T2 = np.asarray(se3.se3_exp(jnp.asarray([1e-4, 0, 0, 0, 0, 0], jnp.float32)))  # ~no baseline

    def proj(T):
        pc = pts @ T[:3, :3].T + T[:3, 3]
        return (pc[:, :2] / pc[:, 2:3] * [K[0, 0], K[1, 1]] + [K[0, 2], K[1, 2]]).astype(np.float32)

    res = triangulate.triangulate_and_gate(
        jnp.asarray(K), jnp.asarray(T1), jnp.asarray(T2),
        jnp.asarray(proj(T1)), jnp.asarray(proj(T2)),
        jnp.ones(1), jnp.ones(1), jnp.ones(1, bool),
    )
    assert not np.asarray(res.valid).any()
