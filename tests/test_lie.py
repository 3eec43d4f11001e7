import jax.numpy as jnp
import numpy as np
from scipy.spatial.transform import Rotation as R

from instantsfm_tpu.math import lie


def random_quats(rng, n):
    q = rng.normal(size=(n, 4))
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


def test_quat_mul_matches_scipy(rng):
    q1, q2 = random_quats(rng, 32), random_quats(rng, 32)
    got = np.asarray(lie.quat_mul(jnp.asarray(q1), jnp.asarray(q2)))
    want = (R.from_quat(q1) * R.from_quat(q2)).as_quat()
    # sign-ambiguous
    sign = np.sign(np.sum(got * want, axis=-1, keepdims=True))
    np.testing.assert_allclose(got * sign, want, atol=1e-12)


def test_quat_rotate_matches_scipy(rng):
    q = random_quats(rng, 32)
    v = rng.normal(size=(32, 3))
    got = np.asarray(lie.quat_rotate(jnp.asarray(q), jnp.asarray(v)))
    want = R.from_quat(q).apply(v)
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_matrix_roundtrip(rng):
    q = random_quats(rng, 64)
    m = lie.quat_to_matrix(jnp.asarray(q))
    np.testing.assert_allclose(np.asarray(m), R.from_quat(q).as_matrix(), atol=1e-12)
    q2 = np.asarray(lie.matrix_to_quat(m))
    sign = np.sign(np.sum(q2 * q, axis=-1, keepdims=True))
    np.testing.assert_allclose(q2 * sign, q, atol=1e-9)


def test_exp_log_roundtrip(rng):
    w = rng.normal(size=(64, 3))
    q = lie.so3_exp(jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(q), R.from_rotvec(w).as_quat(), atol=1e-12)
    w2 = np.asarray(lie.so3_log(q))
    np.testing.assert_allclose(w2, w, atol=1e-9)
    # near-identity branch
    w_small = rng.normal(size=(8, 3)) * 1e-9
    w3 = np.asarray(lie.so3_log(lie.so3_exp(jnp.asarray(w_small))))
    np.testing.assert_allclose(w3, w_small, atol=1e-15)


def test_se3_retract_and_center(rng):
    q = random_quats(rng, 8)
    t = rng.normal(size=(8, 3))
    delta = np.zeros((8, 6))
    q2, t2 = lie.se3_retract(jnp.asarray(q), jnp.asarray(t), jnp.asarray(delta))
    sign = np.sign(np.sum(np.asarray(q2) * q, axis=-1, keepdims=True))
    np.testing.assert_allclose(np.asarray(q2) * sign, q, atol=1e-12)
    np.testing.assert_allclose(np.asarray(t2), t, atol=1e-12)

    c = np.asarray(lie.camera_center(jnp.asarray(q), jnp.asarray(t)))
    want = np.einsum("nij,nj->ni", R.from_quat(q).as_matrix().transpose(0, 2, 1), -t)
    np.testing.assert_allclose(c, want, atol=1e-12)


def test_geodesic_angle(rng):
    q1 = random_quats(rng, 16)
    w = rng.normal(size=(16, 3))
    w = w / np.linalg.norm(w, axis=-1, keepdims=True) * 0.3
    q2 = (R.from_quat(q1) * R.from_rotvec(w)).as_quat()
    ang = np.asarray(lie.rotation_geodesic_angle(jnp.asarray(q1), jnp.asarray(q2)))
    np.testing.assert_allclose(ang, 0.3, atol=1e-7)
