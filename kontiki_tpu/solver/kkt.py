"""Bounds-aware first-order optimality (KKT) residual.

At an unconstrained stationary point the gradient vanishes; with the
reference's box bounds (rho >= 0,
/root/reference/cpplib/include/kontiki/measurements/static_rscamera_measurement.h:178-184;
|time offset| <= max_time_offset,
/root/reference/cpplib/include/kontiki/sensors/sensors.h:135-165; vt in
[0, 1],
/root/reference/cpplib/include/kontiki/measurements/lifting_rscamera_measurement.h:199-204)
the correct certificate is the *projected* gradient:

    interior component:        |g_i|
    at a lower bound:          max(-g_i, 0)   (descent would leave the box)
    at an upper bound:         max(+g_i, 0)
    locked / padded parameter: 0

Tests use this as an implementation-independent optimality gate
(VERDICT r4 next-round #3b): every converged solve must terminate at a
point whose KKT residual is tiny relative to the initial gradient. A
subtly wrong stationary point — a sign error in one Jacobian block, a
mis-assembled Hessian column — fails this check even when the ATE of the
broken solution happens to look plausible, and it needs no external
solver run.
"""
import numpy as np


def kkt_residual(problem, state, *, bound_eps=1e-12):
    """Infinity norm of the bounds-projected gradient at ``state``.

    ``problem`` is a :class:`kontiki_tpu.solver.problem.Problem` (or
    RawProblem); ``state`` a solver state pytree (e.g. ``problem.state0``
    or the state returned by :func:`kontiki_tpu.solver.lm.solve`).
    Locked parameters (mask == 0) are excluded, exactly as Ceres excludes
    constant parameter blocks from its gradient-norm termination test.
    """
    import jax

    from .kernels import (
        SENSOR_TANGENT_DIM,
        _build_solver,
        problem_runtime,
        problem_spec,
    )

    spec = problem_spec(problem)
    # _build_solver is lru-cached per problem structure: repeated KKT
    # checks (and checks on problems the solver already compiled) reuse
    # the jitted linearizer instead of retracing
    _, lin_j, _, _ = _build_solver(spec, jax.config.jax_enable_x64)
    runtime = problem_runtime(problem)
    _, _, g = lin_j(runtime, state)
    g = np.asarray(g, dtype=np.float64)
    mask = np.asarray(runtime["mask"], dtype=np.float64)
    pg = np.abs(g) * mask

    def _at_bound(idx, lower_active, upper_active):
        """Replace |g| with the one-sided violation on bounded coords."""
        gi = g[idx]
        vi = np.abs(gi)
        vi = np.where(lower_active, np.maximum(-gi, 0.0), vi)
        vi = np.where(upper_active, np.maximum(gi, 0.0), vi)
        # both bounds active (degenerate box, e.g. d_max == 0): feasible
        # set is a point, no first-order condition to violate
        vi = np.where(lower_active & upper_active, 0.0, vi)
        pg[idx] = vi * mask[idx]

    S, L, V = spec.num_sensors, spec.num_landmarks, spec.num_vt
    if S:
        d = np.asarray(state["d"], dtype=np.float64)
        d_max = np.asarray(runtime["d_max"], dtype=np.float64)
        idx = spec.sensor_offset + np.arange(S) * SENSOR_TANGENT_DIM + 6
        _at_bound(idx, d <= -d_max + bound_eps, d >= d_max - bound_eps)
    if L:
        rho = np.asarray(state["rho"], dtype=np.float64)
        idx = spec.landmark_offset + np.arange(L)
        _at_bound(idx, rho <= bound_eps, np.zeros(L, dtype=bool))
    if V:
        vt = np.asarray(state["vt"], dtype=np.float64)
        idx = spec.vt_offset + np.arange(V)
        _at_bound(idx, vt <= bound_eps, vt >= 1.0 - bound_eps)
    return float(np.max(pg)) if pg.size else 0.0
