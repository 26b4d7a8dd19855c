"""Quaternion/SE3 math oracles.

Oracle: scipy.spatial.transform.Rotation and identities. Mirrors the
reference's quaternion semantics (quaternion_math.h)."""
import jax
import jax.numpy as jnp
import numpy as np
from numpy.testing import assert_allclose
from scipy.spatial.transform import Rotation

from kontiki_tpu.math import quaternion as quat
from kontiki_tpu.math import se3 as se3m


def random_unit_quat(n=None):
    shape = (4,) if n is None else (n, 4)
    q = np.random.randn(*shape)
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


def to_scipy(q):
    # wxyz -> xyzw
    return Rotation.from_quat(np.roll(np.asarray(q), -1, axis=-1))


def test_qmul_matches_scipy():
    q1, q2 = random_unit_quat(), random_unit_quat()
    out = np.asarray(quat.qmul(jnp.asarray(q1), jnp.asarray(q2)))
    expected = (to_scipy(q1) * to_scipy(q2)).as_quat()
    assert_allclose(np.roll(out, -1), expected * np.sign(expected[-1]) * np.sign(np.roll(out, -1)[-1]), atol=1e-12)


def test_qrotate_matches_scipy():
    q = random_unit_quat(5)
    v = np.random.randn(5, 3)
    out = np.asarray(quat.qrotate(jnp.asarray(q), jnp.asarray(v)))
    expected = to_scipy(q).apply(v)
    assert_allclose(out, expected, atol=1e-12)


def test_log_exp_roundtrip():
    q = random_unit_quat(10)
    # force w >= 0 for principal-branch roundtrip
    q = q * np.sign(q[:, :1])
    lg = quat.logq(jnp.asarray(q))
    back = np.asarray(quat.expq(lg))
    assert_allclose(back, q, atol=1e-12)


def test_logq_small_angle():
    q = np.array([1.0, 1e-12, -1e-12, 1e-12])
    q = q / np.linalg.norm(q)
    lg = np.asarray(quat.logq(jnp.asarray(q)))
    assert_allclose(lg[1:], q[1:], atol=1e-15)
    assert lg[0] == 0.0
    assert np.all(np.isfinite(lg))


def test_logq_differentiable_at_identity():
    jac = jax.jacfwd(quat.logq)(jnp.array([1.0, 0.0, 0.0, 0.0]))
    assert np.all(np.isfinite(np.asarray(jac)))


def test_angular_velocity_identity():
    # For q(t) = exp(t/2 * (0, w)) * q0: dq = 0.5*(0,w)*q and
    # angular_velocity(q, dq) should recover w.
    w = np.array([0.3, -0.2, 0.5])
    q = jnp.asarray(random_unit_quat())
    dq = quat.dq_from_angular_velocity(jnp.asarray(w), q)
    out = np.asarray(quat.angular_velocity(q, dq))
    assert_allclose(out, w, atol=1e-12)


def test_matrix_roundtrip():
    q = random_unit_quat(20)
    R = quat.quat_to_matrix(jnp.asarray(q))
    assert_allclose(np.asarray(R), to_scipy(q).as_matrix(), atol=1e-12)
    back = np.asarray(quat.matrix_to_quat(R))
    # sign ambiguity
    sign = np.sign(np.sum(back * q, axis=-1, keepdims=True))
    assert_allclose(back * sign, q, atol=1e-9)


def test_vector_sandwich():
    qa, qb = jnp.asarray(random_unit_quat()), jnp.asarray(random_unit_quat())
    x = jnp.asarray(np.random.randn(3))
    out = np.asarray(quat.vector_sandwich(qa, x, qb))
    expected = np.asarray(quat.qmul(qa, quat.qmul(quat.embed_vector(x), qb)))[1:]
    assert_allclose(out, expected, atol=1e-12)


# ---------------------------------------------------------------------------
# SE3
# ---------------------------------------------------------------------------

def test_so3_exp_log_roundtrip():
    omega = np.random.randn(10, 3)
    q = se3m.so3_exp_quat(jnp.asarray(omega))
    assert_allclose(
        np.asarray(q),
        np.roll(Rotation.from_rotvec(omega).as_quat(), 1, axis=-1)
        * np.sign(np.asarray(q)[:, :1])
        * np.sign(np.roll(Rotation.from_rotvec(omega).as_quat(), 1, axis=-1)[:, :1]),
        atol=1e-12,
    )
    back = np.asarray(se3m.so3_log(q))
    assert_allclose(back, omega, atol=1e-9)


def test_so3_log_negative_w():
    # minimal-angle: log of -q equals log of q
    q = random_unit_quat()
    a = np.asarray(se3m.so3_log(jnp.asarray(q)))
    b = np.asarray(se3m.so3_log(jnp.asarray(-q)))
    assert_allclose(a, b, atol=1e-9)


def test_se3_exp_log_roundtrip():
    xi = np.random.randn(10, 6)
    q, t = se3m.se3_exp(jnp.asarray(xi))
    back = np.asarray(se3m.se3_log(q, t))
    assert_allclose(back, xi, atol=1e-9)


def test_se3_exp_matches_matrix_expm():
    from scipy.linalg import expm

    xi = np.random.randn(6) * 0.8
    q, t = se3m.se3_exp(jnp.asarray(xi))
    T = np.asarray(se3m.se3_matrix(q, t))
    T_expected = expm(np.asarray(se3m.se3_hat(jnp.asarray(xi))))
    assert_allclose(T, T_expected, atol=1e-9)


def test_se3_mul_inv():
    xi1, xi2 = np.random.randn(6), np.random.randn(6)
    qa, ta = se3m.se3_exp(jnp.asarray(xi1))
    qb, tb = se3m.se3_exp(jnp.asarray(xi2))
    qc, tc = se3m.se3_mul(qa, ta, qb, tb)
    Tc = np.asarray(se3m.se3_matrix(qc, tc))
    expected = np.asarray(se3m.se3_matrix(qa, ta)) @ np.asarray(se3m.se3_matrix(qb, tb))
    assert_allclose(Tc, expected, atol=1e-12)

    qi, ti = se3m.se3_inv(qc, tc)
    eye = np.asarray(se3m.se3_matrix(*se3m.se3_mul(qi, ti, qc, tc)))
    assert_allclose(eye, np.eye(4), atol=1e-12)
