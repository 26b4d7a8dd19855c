"""SE(3) math on JAX arrays, Sophus-compatible conventions.

The reference's SE3 spline is built on Sophus (/root/reference/cpplib/include/
kontiki/trajectories/uniform_se3_spline_trajectory.h). We mirror Sophus's
conventions so behaviors and stored values are interchangeable:

- An SE3 element is a pair ``(q, t)``: unit quaternion wxyz ``[..., 4]`` and
  translation ``[..., 3]``. Packed form is ``[..., 7] = [w,x,y,z, tx,ty,tz]``.
- A tangent vector is ``xi = [upsilon(3), omega(3)]`` — translational part
  first, rotational second (Sophus ordering).
- ``hat(xi)`` is the 4x4 matrix ``[[skew(omega), upsilon], [0, 0]]``.
- ``exp``: ``R = exp(skew(omega)); t = V(omega) upsilon`` with the standard
  left Jacobian ``V``.
- ``log``: inverse, with ``omega`` the minimal-angle rotation vector
  (angle in (-pi, pi], like Sophus SO3::log).

Taylor guards use the safe-``where`` idiom for autodiff cleanliness.
"""
import jax.numpy as jnp

from .quaternion import qconj, qmul, qnormalize, qrotate, quat_to_matrix

_EPS = 1e-10  # theta^2 guard for Taylor branches (Sophus uses eps^2 ~ 1e-20 for double; we guard earlier for autodiff stability)


def skew(v):
    """3-vector -> 3x3 skew-symmetric matrix, batched."""
    zeros = jnp.zeros_like(v[..., 0])
    return jnp.stack(
        [
            jnp.stack([zeros, -v[..., 2], v[..., 1]], -1),
            jnp.stack([v[..., 2], zeros, -v[..., 0]], -1),
            jnp.stack([-v[..., 1], v[..., 0], zeros], -1),
        ],
        axis=-2,
    )


def so3_exp_quat(omega):
    """Rotation vector -> unit quaternion wxyz.

    q = (cos(theta/2), sin(theta/2)/theta * omega), Taylor-guarded.
    """
    theta2 = jnp.sum(omega * omega, axis=-1)
    small = theta2 <= _EPS
    theta = jnp.sqrt(jnp.where(small, 1.0, theta2))
    half = 0.5 * theta
    # sin(theta/2)/theta; Taylor: 1/2 - theta^2/48
    k = jnp.where(small, 0.5 - theta2 / 48.0, jnp.sin(half) / theta)
    w = jnp.where(small, 1.0 - theta2 / 8.0, jnp.cos(half))
    return jnp.concatenate([w[..., None], k[..., None] * omega], axis=-1)


def so3_log(q):
    """Unit quaternion wxyz -> minimal rotation vector (angle in (-pi, pi]).

    Follows Sophus SO3::log's branch structure: for small |v| use the Taylor
    expansion of 2*atan(|v|/w)/|v|; for w near 0 the +/- pi branch; otherwise
    2*atan2(|v|, w)/|v| with w sign folded to keep the angle minimal.
    """
    w = q[..., 0]
    v = q[..., 1:]
    n2 = jnp.sum(v * v, axis=-1)
    small_n = n2 <= _EPS
    n = jnp.sqrt(jnp.where(small_n, 1.0, n2))
    small_w = jnp.abs(w) <= 1e-10

    # Branch A (|v| small): k = 2/w - 2/3 * n^2 / w^3
    w_safe = jnp.where(jnp.abs(w) <= _EPS, 1.0, w)
    k_small = 2.0 / w_safe - (2.0 / 3.0) * n2 / (w_safe ** 3)
    # Branch B (w ~ 0): angle = +/- pi
    k_pi = jnp.where(w >= 0, jnp.pi, -jnp.pi) / n
    # Branch C (general): 2*atan(n/w)/n, signed w — angle in (-pi, pi)
    k_gen = 2.0 * jnp.arctan(n / jnp.where(small_w, 1.0, w)) / n

    k = jnp.where(small_n, k_small, jnp.where(small_w, k_pi, k_gen))
    return k[..., None] * v


def _so3_left_jacobian(omega):
    """V(omega) = I + (1-cos)/t^2 W + (t-sin)/t^3 W^2, Taylor-guarded."""
    theta2 = jnp.sum(omega * omega, axis=-1)
    small = theta2 <= _EPS
    theta = jnp.sqrt(jnp.where(small, 1.0, theta2))
    a = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2)
    b = jnp.where(
        small, 1.0 / 6.0 - theta2 / 120.0, (theta - jnp.sin(theta)) / (theta2 * theta)
    )
    W = skew(omega)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=omega.dtype), W.shape)
    return eye + a[..., None, None] * W + b[..., None, None] * (W @ W)


def _so3_left_jacobian_inv(omega):
    """V^{-1}(omega) = I - W/2 + (1/t^2 - (1+cos)/(2 t sin)) W^2, guarded."""
    theta2 = jnp.sum(omega * omega, axis=-1)
    small = theta2 <= _EPS
    theta = jnp.sqrt(jnp.where(small, 1.0, theta2))
    # coefficient c = 1/t^2 - (1+cos t)/(2 t sin t); Taylor: 1/12 + t^2/720
    sin_t = jnp.sin(theta)
    safe = jnp.where(small | (jnp.abs(sin_t) <= _EPS), 1.0, 2.0 * theta * sin_t)
    c = jnp.where(
        small,
        1.0 / 12.0 + theta2 / 720.0,
        1.0 / jnp.where(small, 1.0, theta2) - (1.0 + jnp.cos(theta)) / safe,
    )
    W = skew(omega)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=omega.dtype), W.shape)
    return eye - 0.5 * W + c[..., None, None] * (W @ W)


def se3_hat(xi):
    """Tangent [upsilon, omega] -> 4x4 matrix [[skew(omega), upsilon],[0,0]]."""
    upsilon, omega = xi[..., :3], xi[..., 3:]
    top = jnp.concatenate([skew(omega), upsilon[..., :, None]], axis=-1)
    bottom = jnp.zeros(xi.shape[:-1] + (1, 4), dtype=xi.dtype)
    return jnp.concatenate([top, bottom], axis=-2)


def se3_exp(xi):
    """Tangent -> (q, t)."""
    upsilon, omega = xi[..., :3], xi[..., 3:]
    q = so3_exp_quat(omega)
    V = _so3_left_jacobian(omega)
    t = jnp.einsum("...ij,...j->...i", V, upsilon)
    return q, t


def se3_log(q, t):
    """(q, t) -> tangent [upsilon, omega]."""
    omega = so3_log(q)
    Vinv = _so3_left_jacobian_inv(omega)
    upsilon = jnp.einsum("...ij,...j->...i", Vinv, t)
    return jnp.concatenate([upsilon, omega], axis=-1)


def se3_mul(qa, ta, qb, tb):
    """Group composition (qa,ta) * (qb,tb)."""
    return qmul(qa, qb), qrotate(qa, tb) + ta


def se3_inv(q, t):
    """Group inverse."""
    qi = qconj(q)
    return qi, -qrotate(qi, t)


def se3_matrix(q, t):
    """(q, t) -> 4x4 homogeneous matrix."""
    R = quat_to_matrix(q)
    top = jnp.concatenate([R, t[..., :, None]], axis=-1)
    bottom = jnp.zeros(q.shape[:-1] + (1, 4), dtype=q.dtype)
    bottom = bottom.at[..., 0, 3].set(1.0)
    return jnp.concatenate([top, bottom], axis=-2)


def se3_pack(q, t):
    """(q, t) -> packed [..., 7]."""
    return jnp.concatenate([q, t], axis=-1)


def se3_unpack(p):
    """Packed [..., 7] -> (q, t)."""
    return p[..., :4], p[..., 4:]


def se3_normalize(p):
    """Renormalize the quaternion part of a packed SE3."""
    q, t = se3_unpack(p)
    return se3_pack(qnormalize(q), t)
