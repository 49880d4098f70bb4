import jax.numpy as jnp
import numpy as np

from orbslam2_nmi_tpu.geometry import se3
from orbslam2_nmi_tpu.solvers import pose_gn

K = np.array([[400.0, 0, 320], [0, 400.0, 240], [0, 0, 1]], np.float32)


def make_scene(n=200, seed=0, noise=0.0, outlier_frac=0.0):
    rng = np.random.default_rng(seed)
    pts = np.stack(
        [
            rng.uniform(-4, 4, n),
            rng.uniform(-3, 3, n),
            rng.uniform(4, 12, n),
        ],
        axis=-1,
    ).astype(np.float32)
    Tcw_true = np.asarray(
        se3.se3_exp(jnp.asarray([0.1, -0.05, 0.2, 0.03, -0.02, 0.05], jnp.float32))
    )
    pc = pts @ Tcw_true[:3, :3].T + Tcw_true[:3, 3]
    uv = pc[:, :2] / pc[:, 2:3] * [K[0, 0], K[1, 1]] + [K[0, 2], K[1, 2]]
    uv = uv + rng.normal(0, noise, uv.shape)
    n_out = int(outlier_frac * n)
    if n_out:
        uv[:n_out] += rng.uniform(30, 80, (n_out, 2)) * rng.choice([-1, 1], (n_out, 2))
    return pts, uv.astype(np.float32), Tcw_true


def run(pts, uv, T0, n_valid=None):
    n = len(pts)
    valid = np.ones(n, bool)
    if n_valid is not None:
        valid[n_valid:] = False
    res = pose_gn.pose_optimization_jit(
        jnp.asarray(K),
        jnp.asarray(T0),
        jnp.asarray(pts),
        jnp.asarray(uv),
        jnp.ones(n, jnp.float32),
        jnp.asarray(valid),
    )
    return res


def test_recovers_pose_noiseless():
    pts, uv, T_true = make_scene()
    T0 = np.asarray(se3.se3_exp(jnp.zeros(6)))  # identity initial guess
    res = run(pts, uv, T0)
    err = np.asarray(se3.se3_log(jnp.asarray(np.linalg.inv(T_true) @ np.asarray(res.Tcw))))
    assert np.abs(err).max() < 1e-3, err
    assert int(res.n_inliers) == len(pts)


def test_robust_to_outliers():
    pts, uv, T_true = make_scene(noise=0.5, outlier_frac=0.25, seed=1)
    # start from a perturbed pose (like motion-model prediction)
    T0 = np.asarray(
        se3.se3_exp(jnp.asarray([0.05, 0.0, 0.15, 0.02, -0.01, 0.03], jnp.float32))
    )
    res = run(pts, uv, T0)
    err = np.asarray(se3.se3_log(jnp.asarray(np.linalg.inv(T_true) @ np.asarray(res.Tcw))))
    assert np.abs(err[:3]).max() < 0.02, err  # translation within 2 cm
    assert np.abs(err[3:]).max() < 0.005, err
    inl = np.asarray(res.inliers)
    assert not inl[: int(0.25 * len(pts))].any(), "gross outliers must be gated"
    assert inl[int(0.25 * len(pts)) :].mean() > 0.9


def test_respects_valid_mask():
    pts, uv, T_true = make_scene(seed=2)
    uv_bad = uv.copy()
    uv_bad[150:] = 0.0  # garbage observations, masked out
    T0 = np.asarray(se3.se3_exp(jnp.zeros(6)))
    res = run(pts, uv_bad, T0, n_valid=150)
    err = np.asarray(se3.se3_log(jnp.asarray(np.linalg.inv(T_true) @ np.asarray(res.Tcw))))
    assert np.abs(err).max() < 1e-3
    assert not np.asarray(res.inliers)[150:].any()


def test_weighted_by_octave_sigma():
    pts, uv, T_true = make_scene(noise=1.0, seed=3)
    inv_sigma2 = np.ones(len(pts), np.float32)
    inv_sigma2[::2] = 1.0 / 1.2**2
    res = pose_gn.pose_optimization_jit(
        jnp.asarray(K),
        jnp.asarray(np.asarray(se3.se3_exp(jnp.zeros(6)))),
        jnp.asarray(pts),
        jnp.asarray(uv),
        jnp.asarray(inv_sigma2),
        jnp.ones(len(pts), bool),
    )
    err = np.asarray(se3.se3_log(jnp.asarray(np.linalg.inv(T_true) @ np.asarray(res.Tcw))))
    assert np.abs(err[:3]).max() < 0.03
