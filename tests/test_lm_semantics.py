"""LM solver semantics: Ceres robust-loss parity and per-phase timing.

The reference's entire observability surface is ceres::Solver::Summary
(py_ceres.cc:29-43); these tests pin the fields our Summary must populate
honestly, and the robust-loss treatment to Ceres corrector.cc semantics."""
import numpy as np

from kontiki_tpu.solver.kernels import _huber, _huber_prime, _huber_second
from kontiki_tpu.solver.lm import solve
from kontiki_tpu.solver.problem import Problem
from kontiki_tpu.synthetic import make_gyro_problem, make_rsvi_problem


def test_huber_triggs_corrector_reduces_to_irls():
    """Ceres's Triggs corrector (corrector.cc) falls back to alpha=0 —
    plain sqrt(rho') scaling of residual and Jacobian — whenever
    rho''(s) <= 0. Huber's rho'' is 0 (inlier) or negative (outlier)
    everywhere, so the IRLS weighting used by the kernels IS the Ceres
    corrector for HuberLoss, exactly."""
    c = 5.0
    s = np.concatenate([np.linspace(0.0, 24.9, 50), np.linspace(25.1, 1e6, 50)])
    rho2 = np.asarray(_huber_second(s, c))
    assert np.all(rho2 <= 0.0)
    # Consistency of the loss family: rho' is the derivative of rho,
    # rho'' the derivative of rho' (checked by finite differences away
    # from the c^2 kink).
    eps = 1e-4
    s_mid = np.asarray([1.0, 10.0, 30.0, 100.0, 1e4])
    d1 = (np.asarray(_huber(s_mid + eps, c)) - np.asarray(_huber(s_mid - eps, c))) / (
        2 * eps
    )
    np.testing.assert_allclose(d1, np.asarray(_huber_prime(s_mid, c)), rtol=1e-6)
    d2 = (
        np.asarray(_huber_prime(s_mid + eps, c))
        - np.asarray(_huber_prime(s_mid - eps, c))
    ) / (2 * eps)
    np.testing.assert_allclose(
        d2, np.asarray(_huber_second(s_mid, c)), rtol=1e-5, atol=1e-12
    )


def test_summary_per_phase_times_populated():
    prob = make_gyro_problem(duration=2.0, rate=50.0, seed=3)
    problem = Problem(prob["trajectory"], prob["measurements"])
    state, summary = solve(problem, max_iterations=5)
    assert summary.jacobian_evaluation_time_in_seconds > 0.0
    assert summary.linear_solver_time_in_seconds > 0.0
    assert summary.residual_evaluation_time_in_seconds > 0.0
    total_phases = (
        summary.jacobian_evaluation_time_in_seconds
        + summary.linear_solver_time_in_seconds
        + summary.residual_evaluation_time_in_seconds
    )
    assert total_phases <= summary.total_time_in_seconds + 1e-6


def test_solve_phases_match_across_strategies():
    """The phase-split path must produce the same optimization as before:
    schur and dense strategies converge to the same cost on a camera
    problem."""
    prob = make_rsvi_problem(nviews=6, nlandmarks=8, imu_rate=50.0, seed=11)
    problem = Problem(prob["trajectory"], prob["measurements"])
    _, s_schur = solve(problem, max_iterations=15, strategy="schur")
    problem2 = Problem(prob["trajectory"], prob["measurements"])
    _, s_dense = solve(problem2, max_iterations=15, strategy="dense")
    assert s_schur.final_cost < 1e-8 * s_schur.initial_cost
    np.testing.assert_allclose(
        s_schur.final_cost, s_dense.final_cost, rtol=1e-3, atol=1e-20
    )
    problem3 = Problem(prob["trajectory"], prob["measurements"])
    _, s_iter = solve(problem3, max_iterations=15, strategy="iterative_schur")
    assert s_iter.final_cost < 1e-8 * s_iter.initial_cost


def test_assembled_gradient_matches_reverse_mode_ad():
    """The linearizer's assembled gradient g = J^T rho' r must equal
    reverse-mode AD of total_cost through the retraction at delta = 0.

    This is an implementation-independent consistency check on the whole
    hand-seeded linearization chain (fused camera/Newton/IMU kernels,
    staged Jacobians, Huber weighting, column masking): jax.grad derives
    the gradient from the cost alone, sharing none of the Jacobian
    assembly. Run on a config-4-shaped problem (Newton-RS + static-RS
    + IMU + Huber) at an interior point (all rho > 0, bounds inactive,
    so the retraction's clips are differentiable identities)."""
    import jax
    import jax.numpy as jnp

    from kontiki_tpu.solver.kernels import (
        build_parts,
        problem_runtime,
        problem_spec,
    )

    for rs in ("newton", "static"):
        prob = make_rsvi_problem(
            nviews=5, nlandmarks=6, imu_rate=30.0, seed=13, rs=rs,
            noise_px=0.5, perturb_rho=0.05,
        )
        problem = Problem(prob["trajectory"], prob["measurements"])
        spec = problem_spec(problem)
        parts = build_parts(spec, jax.config.jax_enable_x64)
        runtime = problem_runtime(problem)
        state = problem.state0
        assert np.all(np.asarray(state["rho"]) > 0)

        _, _, g = jax.jit(parts["linearize"])(runtime, state)

        def cost_of(delta):
            return parts["total_cost"](
                runtime, parts["retract"](runtime, state, delta)
            )

        g_ad = jax.grad(cost_of)(jnp.zeros(spec.num_tangent, g.dtype))
        mask = np.asarray(runtime["mask"])
        scale = np.abs(np.asarray(g)).max()
        np.testing.assert_allclose(
            np.asarray(g) * mask, np.asarray(g_ad) * mask,
            atol=1e-10 * scale, rtol=1e-8,
        )
