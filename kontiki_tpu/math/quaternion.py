"""Quaternion math on JAX arrays.

Layout convention: quaternions are ``[..., 4]`` arrays in **wxyz** order
(scalar first). This matches the reference's Python-facing convention
(wxyz vectors, see /root/reference/python/src/kontiki/trajectories/
py_uniform_so3_spline_trajectory.cc:23-33) even though Eigen stores xyzw
internally.

Behavioral parity targets (reference: /root/reference/cpplib/include/kontiki/
math/quaternion_math.h:16-121):

- ``logq``  — unit-quaternion logarithm with a Taylor fallback
  ``k = atan2(|v|, w)/|v| -> 1`` when ``|v|^2 <= 1e-16``.
- ``expq``  — full quaternion exponential ``e^w (cos|v|, sinc(|v|) v)`` with
  the same ``|v|^2 <= 1e-16`` guard.
- ``angular_velocity(q, dq) = 2 (dq q^-1).vec``.
- ``dq_from_angular_velocity(w, q) = 0.5 (0,w) q``.
- ``vector_sandwich(qa, x, qb) = (qa (0,x) qb).vec``.
- ``is_unit_quaternion`` with tolerance 1e-5.

All functions broadcast over leading axes and are differentiable (the Taylor
guards use the safe-``where`` idiom so no NaN/Inf leaks through ``jax.jacfwd``
— the same numerical branches ``ceres::Jet`` takes).
"""
import jax.numpy as jnp

#: Guard below which Taylor fallbacks engage (reference ``math::eps``).
EPS = 1e-16
#: Unit-norm check tolerance (reference ``math::eps_unit_check``).
EPS_UNIT_CHECK = 1e-5


def qmul(q1, q2):
    """Hamilton product of wxyz quaternions (broadcasting)."""
    w1, x1, y1, z1 = q1[..., 0], q1[..., 1], q1[..., 2], q1[..., 3]
    w2, x2, y2, z2 = q2[..., 0], q2[..., 1], q2[..., 2], q2[..., 3]
    return jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        axis=-1,
    )


def qconj(q):
    """Quaternion conjugate."""
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def qvec(q):
    """Vector (imaginary) part."""
    return q[..., 1:]


def embed_vector(v):
    """Embed a 3-vector as a pure quaternion (0, v)."""
    zeros = jnp.zeros(v.shape[:-1] + (1,), dtype=v.dtype)
    return jnp.concatenate([zeros, v], axis=-1)


def qrotate(q, v):
    """Rotate vector(s) v by unit quaternion(s) q: (q (0,v) q*).vec.

    Uses the expanded 15-multiply form rather than two quaternion products —
    fewer flops and better VPU fusion.
    """
    qv = q[..., 1:]
    w = q[..., 0:1]
    t = 2.0 * jnp.cross(qv, v)
    return v + w * t + jnp.cross(qv, t)


def logq(q):
    """Unit-quaternion logarithm, returned as a pure quaternion (0, k*v).

    ``k = atan2(|v|, w) / |v|`` with first-order Taylor fallback ``k = 1``
    when ``|v|^2 <= EPS`` (reference quaternion_math.h:44-52). The caller is
    responsible for q being (close to) unit norm; validation lives in the
    Python wrapper layer, matching the reference's runtime_error check.
    """
    v = q[..., 1:]
    w = q[..., 0]
    v2 = jnp.sum(v * v, axis=-1)
    small = v2 <= EPS
    vn = jnp.sqrt(jnp.where(small, 1.0, v2))
    k = jnp.where(small, 1.0, jnp.arctan2(vn, w) / vn)
    out_v = v * k[..., None]
    zeros = jnp.zeros_like(w)
    return jnp.concatenate([zeros[..., None], out_v], axis=-1)


def expq(q):
    """Quaternion exponential ``e^w (cos|v|, sinc(|v|) v)``.

    Taylor fallback ``cos -> 1, sinc -> 1`` when ``|v|^2 <= EPS``
    (reference quaternion_math.h:74-83).
    """
    v = q[..., 1:]
    w = q[..., 0]
    v2 = jnp.sum(v * v, axis=-1)
    small = v2 <= EPS
    vn = jnp.sqrt(jnp.where(small, 1.0, v2))
    ea = jnp.exp(w)
    ka = jnp.where(small, ea, ea * jnp.cos(vn))
    kv = jnp.where(small, ea, ea * jnp.sin(vn) / vn)
    return jnp.concatenate([ka[..., None], kv[..., None] * v], axis=-1)


def angular_velocity(q, dq):
    """World-frame angular velocity from orientation q and its derivative dq.

    ``omega = 2 * (dq * q^-1).vec`` (reference quaternion_math.h:92-96).
    """
    return 2.0 * qmul(dq, qconj(q))[..., 1:]


def dq_from_angular_velocity(w, q):
    """Orientation derivative from world angular velocity: 0.5 (0,w) q."""
    return 0.5 * qmul(embed_vector(w), q)


def vector_sandwich(qa, x, qb):
    """``(qa * (0,x) * qb).vec`` (reference quaternion_math.h:107-114)."""
    return qmul(qa, qmul(embed_vector(x), qb))[..., 1:]


def is_unit_quaternion(q, tol=EPS_UNIT_CHECK):
    """|‖q‖ − 1| < tol elementwise over the last axis (reference tol 1e-5)."""
    return jnp.abs(jnp.linalg.norm(q, axis=-1) - 1.0) < tol


def qnormalize(q):
    """Normalize to unit norm."""
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def quat_to_matrix(q):
    """Rotation matrix from unit wxyz quaternion; shape [..., 3, 3]."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    row0 = jnp.stack([1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)], -1)
    row1 = jnp.stack([2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)], -1)
    row2 = jnp.stack([2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)], -1)
    return jnp.stack([row0, row1, row2], axis=-2)


def matrix_to_quat(R):
    """Robust rotation-matrix → wxyz quaternion (Shepperd's method).

    Branch selection via ``where`` keeps it usable under vmap; within any
    single branch the map is smooth, so autodiff is valid away from branch
    boundaries (the same caveat applies to Eigen's implementation used by the
    reference).
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    def safe_sqrt(x):
        return jnp.sqrt(jnp.maximum(x, EPS))

    # Candidate 0: trace
    s0 = safe_sqrt(tr + 1.0) * 2.0
    q0 = jnp.stack([0.25 * s0, (m21 - m12) / s0, (m02 - m20) / s0,
                    (m10 - m01) / s0], -1)
    # Candidate 1: m00 largest
    s1 = safe_sqrt(1.0 + m00 - m11 - m22) * 2.0
    q1 = jnp.stack([(m21 - m12) / s1, 0.25 * s1, (m01 + m10) / s1,
                    (m02 + m20) / s1], -1)
    # Candidate 2: m11 largest
    s2 = safe_sqrt(1.0 + m11 - m00 - m22) * 2.0
    q2 = jnp.stack([(m02 - m20) / s2, (m01 + m10) / s2, 0.25 * s2,
                    (m12 + m21) / s2], -1)
    # Candidate 3: m22 largest
    s3 = safe_sqrt(1.0 + m22 - m00 - m11) * 2.0
    q3 = jnp.stack([(m10 - m01) / s3, (m02 + m20) / s3, (m12 + m21) / s3,
                    0.25 * s3], -1)

    cond_tr = (tr > 0.0)[..., None]
    cond1 = ((m00 > m11) & (m00 > m22))[..., None]
    cond2 = (m11 > m22)[..., None]
    q = jnp.where(cond_tr, q0, jnp.where(cond1, q1, jnp.where(cond2, q2, q3)))
    return qnormalize(q)
