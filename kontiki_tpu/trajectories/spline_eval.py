"""Pure, jittable uniform cubic B-spline evaluation kernels.

This is the numerical heart of the framework (reference behavior:
/root/reference/cpplib/include/kontiki/trajectories/spline_base.h:18-28,
uniform_r3_spline_trajectory.h:34-101, uniform_so3_spline_trajectory.h:81-122,
uniform_se3_spline_trajectory.h:101-194). Unlike the reference, which
evaluates one scalar time per call under ``ceres::Jet``, everything here is
batched over time arrays: one gather of 4-knot windows plus small dense
basis contractions, which XLA fuses and tiles onto the TPU vector/matrix
units. Differentiation is `jax.jacfwd` over the window inputs (the role
``Jet<T, N>`` plays in the reference).

Conventions
-----------
- ``i0 = floor((t - t0) / dt)``; ``u = (t - t0)/dt - i0`` in [0, 1).
  ``floor`` is taken on the primal value only (non-differentiable), exactly
  like the reference's ``PotentiallyUnsafeFloor`` on Jets
  (spline_base.h:155-163).
- Basis: ``B(j) = sum_k u^k M[k, j]`` with the standard cubic matrix ``M``
  and the cumulative matrix ``M_CUMUL`` (spline_base.h:18-28).
- A spline with ``n`` knots is valid on ``[t0, t0 + (n-3) dt)``; evaluation
  requires ``0 <= i0 <= n-4``. Range validation lives in the Python wrapper
  layer; these kernels clamp ``i0`` for safety under jit.
"""
import jax
import jax.numpy as jnp

from ..math import quaternion as quat
from ..math import se3 as se3m

# B(j) = sum_k u^k M[k][j]  (reference spline_base.h:18-22)
M_BASIS = jnp.array(
    [
        [1.0 / 6.0, 4.0 / 6.0, 1.0 / 6.0, 0.0],
        [-3.0 / 6.0, 0.0, 3.0 / 6.0, 0.0],
        [3.0 / 6.0, -6.0 / 6.0, 3.0 / 6.0, 0.0],
        [-1.0 / 6.0, 3.0 / 6.0, -3.0 / 6.0, 1.0 / 6.0],
    ]
)

# Cumulative-form basis (reference spline_base.h:24-28)
M_CUMUL = jnp.array(
    [
        [6.0 / 6.0, 5.0 / 6.0, 1.0 / 6.0, 0.0],
        [0.0, 3.0 / 6.0, 3.0 / 6.0, 0.0],
        [0.0, -3.0 / 6.0, 3.0 / 6.0, 0.0],
        [0.0, 1.0 / 6.0, -2.0 / 6.0, 1.0 / 6.0],
    ]
)


def index_and_u(t, t0, dt, n_knots):
    """Segment index and interpolation amount for (batched) times.

    Returns ``(i0, u)`` with ``i0`` int32 clamped to ``[0, n_knots-4]`` and
    ``u`` differentiable through ``t`` (floor contributes zero gradient,
    matching reference spline_base.h:148-163).
    """
    s = (t - t0) / dt
    i0f = jnp.floor(jax.lax.stop_gradient(s))
    i0 = jnp.clip(i0f.astype(jnp.int32), 0, jnp.asarray(n_knots, jnp.int32) - 4)
    u = s - i0.astype(s.dtype)
    return i0, u


def basis_vectors(u, dt, cumulative=False):
    """Position/velocity/acceleration basis rows for interpolation amount u.

    Returns ``(B, dB, d2B)``, each ``[..., 4]``:
    ``B = [1,u,u^2,u^3] M``, ``dB = [0,1,2u,3u^2]/dt M``,
    ``d2B = [0,0,2,6u]/dt^2 M``.
    """
    Mm = (M_CUMUL if cumulative else M_BASIS).astype(u.dtype)
    one = jnp.ones_like(u)
    zero = jnp.zeros_like(u)
    u2 = u * u
    dt_inv = 1.0 / dt
    U = jnp.stack([one, u, u2, u2 * u], axis=-1)
    dU = dt_inv * jnp.stack([zero, one, 2.0 * u, 3.0 * u2], axis=-1)
    d2U = (dt_inv * dt_inv) * jnp.stack([zero, zero, 2.0 * one, 6.0 * u], axis=-1)
    return U @ Mm, dU @ Mm, d2U @ Mm


def gather_windows(knots, i0):
    """Gather 4-knot windows: knots [N, D], i0 [...] -> [..., 4, D]."""
    idx = i0[..., None] + jnp.arange(4, dtype=i0.dtype)
    return jnp.take(knots, idx, axis=0, mode="clip")


# ---------------------------------------------------------------------------
# Window-level evaluation (4 knots + u). These are the units residuals
# differentiate through; batched paths vmap them after one gather.
# ---------------------------------------------------------------------------

def r3_window(window, u, dt):
    """R3 spline: window [4, 3], scalar u -> (p, v, a).

    p = sum_j B(j) cp_j etc. (reference uniform_r3_spline_trajectory.h:62-92).
    """
    B, dB, d2B = basis_vectors(u, dt, cumulative=False)
    p = B @ window
    v = dB @ window
    a = d2B @ window
    return p, v, a


def so3_window(window, u, dt):
    """SO3 cumulative quaternion spline: window [4, 4] wxyz, scalar u.

    Returns ``(q, omega)`` — world orientation and world angular velocity.
    q = q_0 * prod_{j=1..3} exp(B~(j) log(q_{j-1}^-1 q_j)); omega via the
    product-rule accumulation over the three factors
    (reference uniform_so3_spline_trajectory.h:81-122).
    """
    B, dB, _ = basis_vectors(u, dt, cumulative=True)

    q = window[0]
    identity = jnp.array([1.0, 0.0, 0.0, 0.0], dtype=window.dtype)
    dq_parts = [identity, identity, identity]
    for i in (1, 2, 3):
        omega = quat.logq(quat.qmul(quat.qconj(window[i - 1]), window[i]))
        eomegab = quat.expq(omega * B[i])
        q = quat.qmul(q, eomegab)
        for j in (1, 2, 3):
            m = j - 1
            if i == j:
                dq_parts[m] = quat.qmul(dq_parts[m], omega * dB[i])
            dq_parts[m] = quat.qmul(dq_parts[m], eomegab)

    dq = quat.qmul(window[0], dq_parts[0] + dq_parts[1] + dq_parts[2])
    omega_world = quat.angular_velocity(q, dq)
    return q, omega_world


def se3_window(window, u, dt):
    """SE3 cumulative spline: window [4, 7] packed (q wxyz, t), scalar u.

    Returns ``(p, v, a, q, omega)``. First/second derivative 4x4 matrices via
    the product rule incl. cross terms (reference
    uniform_se3_spline_trajectory.h:101-194). Note: the translational part of
    P'' is NOT body acceleration — same caveat as the reference (its tests
    xfail SE3 acceleration).
    """
    B, dB, d2B = basis_vectors(u, dt, cumulative=True)

    q_k, t_k = se3m.se3_unpack(window)
    Pq, Pt = q_k[0], t_k[0]

    A = []
    A_prim = []
    A_bis = []
    for j in (1, 2, 3):
        qi, ti = se3m.se3_inv(q_k[j - 1], t_k[j - 1])
        q_rel, t_rel = se3m.se3_mul(qi, ti, q_k[j], t_k[j])
        omega6 = se3m.se3_log(q_rel, t_rel)
        omega_hat = se3m.se3_hat(omega6)
        Aq, At = se3m.se3_exp(B[j] * omega6)
        Pq, Pt = se3m.se3_mul(Pq, Pt, Aq, At)

        Amat = se3m.se3_matrix(Aq, At)
        Aj_prim = Amat @ omega_hat * dB[j]
        A.append(Amat)
        A_prim.append(Aj_prim)
        A_bis.append(Aj_prim @ omega_hat * dB[j] + Amat @ omega_hat * d2B[j])

    P0 = se3m.se3_matrix(q_k[0], t_k[0])
    M1 = A_prim[0] @ A[1] @ A[2] + A[0] @ A_prim[1] @ A[2] + A[0] @ A[1] @ A_prim[2]
    P_prim = P0 @ M1
    M2 = (
        A_bis[0] @ A[1] @ A[2]
        + A[0] @ A_bis[1] @ A[2]
        + A[0] @ A[1] @ A_bis[2]
        + 2.0 * A_prim[0] @ A_prim[1] @ A[2]
        + 2.0 * A_prim[0] @ A[1] @ A_prim[2]
        + 2.0 * A[0] @ A_prim[1] @ A_prim[2]
    )
    P_bis = P0 @ M2

    p = Pt
    v = P_prim[:3, 3]
    a = P_bis[:3, 3]
    R_T = quat.quat_to_matrix(Pq).T
    omega_hat_w = P_prim[:3, :3] @ R_T
    omega = 0.5 * jnp.stack(
        [
            omega_hat_w[2, 1] - omega_hat_w[1, 2],
            omega_hat_w[0, 2] - omega_hat_w[2, 0],
            omega_hat_w[1, 0] - omega_hat_w[0, 1],
        ]
    )
    return p, v, a, Pq, omega


# ---------------------------------------------------------------------------
# Batched spline evaluation over time arrays.
# ---------------------------------------------------------------------------

def _use_eval_kernel():
    """Batched queries route through the Pallas component kernels on TPU
    (ops/linearize_kernels.evaluate_windows); the vmapped jnp path stays
    the reference implementation elsewhere."""
    import os

    if os.environ.get("KONTIKI_EVAL_KERNEL", "auto") == "off":
        return False
    # an active jax.default_device(cpu) context (e.g. host-side problem
    # generation) overrides the backend: the compiled kernel must not be
    # dispatched to a CPU device
    dev = jax.config.jax_default_device
    if dev is not None and getattr(dev, "platform", "tpu") != "tpu":
        return False
    return jax.default_backend() == "tpu"


def r3_evaluate(knots, t0, dt, ts):
    """Batched R3 evaluation: knots [N,3], ts [B] -> (p, v, a) each [B,3]."""
    i0, u = index_and_u(ts, t0, dt, knots.shape[0])
    windows = gather_windows(knots, i0)
    if _use_eval_kernel():
        from ..ops.linearize_kernels import evaluate_windows

        return evaluate_windows("r3", windows, u, dt)
    B, dB, d2B = basis_vectors(u, dt, cumulative=False)
    p = jnp.einsum("bj,bjd->bd", B, windows)
    v = jnp.einsum("bj,bjd->bd", dB, windows)
    a = jnp.einsum("bj,bjd->bd", d2B, windows)
    return p, v, a


def so3_evaluate(knots, t0, dt, ts):
    """Batched SO3 evaluation: knots [N,4], ts [B] -> (q [B,4], omega [B,3])."""
    i0, u = index_and_u(ts, t0, dt, knots.shape[0])
    windows = gather_windows(knots, i0)
    if _use_eval_kernel():
        from ..ops.linearize_kernels import evaluate_windows

        return evaluate_windows("so3", windows, u, dt)
    return jax.vmap(so3_window, in_axes=(0, 0, None))(windows, u, dt)


def se3_evaluate(knots, t0, dt, ts):
    """Batched SE3 evaluation: knots [N,7], ts [B] ->
    (p, v, a, q, omega)."""
    i0, u = index_and_u(ts, t0, dt, knots.shape[0])
    windows = gather_windows(knots, i0)
    if _use_eval_kernel():
        from ..ops.linearize_kernels import evaluate_windows

        return evaluate_windows("se3", windows, u, dt)
    return jax.vmap(se3_window, in_axes=(0, 0, None))(windows, u, dt)
