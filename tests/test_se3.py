import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orbslam2_nmi_tpu.geometry import se3


def random_rotation(rng):
    w = rng.standard_normal(3)
    return np.asarray(se3.so3_exp(jnp.asarray(w, dtype=jnp.float32)))


def test_so3_exp_log_roundtrip():
    rng = np.random.default_rng(0)
    for scale in [1e-6, 0.1, 1.0, 3.0]:
        w = rng.standard_normal(3).astype(np.float32)
        w = w / np.linalg.norm(w) * scale
        R = se3.so3_exp(jnp.asarray(w))
        w2 = np.asarray(se3.so3_log(R))
        np.testing.assert_allclose(w2, w, atol=1e-3)  # f32 precision


def test_so3_exp_is_rotation():
    rng = np.random.default_rng(1)
    w = jnp.asarray(rng.standard_normal((16, 3)).astype(np.float32))
    R = se3.so3_exp(w)
    eye = jnp.broadcast_to(jnp.eye(3), R.shape)
    np.testing.assert_allclose(np.asarray(R @ jnp.swapaxes(R, -1, -2)), np.asarray(eye), atol=1e-5)
    np.testing.assert_allclose(np.asarray(jnp.linalg.det(R)), 1.0, atol=1e-5)


def test_quat_rot_roundtrip():
    rng = np.random.default_rng(2)
    for _ in range(10):
        R = random_rotation(rng)
        q = se3.rot_to_quat(jnp.asarray(R))
        R2 = np.asarray(se3.quat_to_rot(q))
        np.testing.assert_allclose(R2, R, atol=1e-5)


def test_quat_mul_matches_rot_compose():
    rng = np.random.default_rng(3)
    Ra, Rb = random_rotation(rng), random_rotation(rng)
    qa, qb = se3.rot_to_quat(jnp.asarray(Ra)), se3.rot_to_quat(jnp.asarray(Rb))
    q_ab = se3.quat_mul(qa, qb)
    np.testing.assert_allclose(np.asarray(se3.quat_to_rot(q_ab)), Ra @ Rb, atol=1e-5)


def test_se3_exp_log_roundtrip():
    rng = np.random.default_rng(4)
    xi = rng.standard_normal(6).astype(np.float32) * 0.5
    T = se3.se3_exp(jnp.asarray(xi))
    xi2 = np.asarray(se3.se3_log(T))
    np.testing.assert_allclose(xi2, xi, atol=1e-4)


def test_se3_inverse():
    rng = np.random.default_rng(5)
    xi = jnp.asarray(rng.standard_normal(6).astype(np.float32))
    T = se3.se3_exp(xi)
    TT = np.asarray(T @ se3.se3_inverse(T))
    np.testing.assert_allclose(TT, np.eye(4), atol=1e-5)


def test_se3_apply():
    T = se3.make_se3(jnp.eye(3), jnp.array([1.0, 2.0, 3.0]))
    p = jnp.array([0.5, 0.5, 0.5])
    np.testing.assert_allclose(np.asarray(se3.se3_apply(T, p)), [1.5, 2.5, 3.5], atol=1e-6)


def test_sim3_inverse_and_scale():
    rng = np.random.default_rng(6)
    R = jnp.asarray(random_rotation(rng))
    t = jnp.array([1.0, -2.0, 0.5])
    s = jnp.array(1.7)
    S = se3.make_sim3(R, t, s)
    np.testing.assert_allclose(float(se3.sim3_scale(S)), 1.7, atol=1e-5)
    SS = np.asarray(S @ se3.sim3_inverse(S))
    np.testing.assert_allclose(SS, np.eye(4), atol=1e-5)


def test_batched_exp():
    rng = np.random.default_rng(7)
    xi = jnp.asarray(rng.standard_normal((8, 6)).astype(np.float32))
    T = se3.batched_se3_exp(xi)
    assert T.shape == (8, 4, 4)


def test_vmap_jit_composition():
    f = jax.jit(jax.vmap(lambda w: se3.so3_log(se3.so3_exp(w))))
    w = jnp.ones((4, 3)) * 0.3
    np.testing.assert_allclose(np.asarray(f(w)), np.asarray(w), atol=1e-5)
