"""End-to-end accuracy: the solver must recover the synthetic ground truth.

BASELINE.md's headline metric is trajectory accuracy (ATE). The reference
has no accuracy tests of its own (SURVEY §4.7) — these go beyond it: each
BASELINE.json config is generated noise-free from a known trajectory,
solved from a perturbed start, and the estimate must match the truth to
tight bounds (after removing each problem's gauge freedom: global rotation
for gyro-only, sim3 for pure vision, se3 for visual-inertial)."""
import numpy as np
import pytest

from kontiki_tpu.solver.kkt import kkt_residual
from kontiki_tpu.solver.lm import solve
from kontiki_tpu.solver.problem import Problem
from kontiki_tpu.synthetic import (
    make_gyro_problem,
    make_imu_problem,
    make_rsvi_problem,
    trajectory_aoe,
    trajectory_ate,
)


def _solve_and_write_back(prob, kkt_ratio=1e-9, **kwargs):
    """Solve and gate on the bounds-aware KKT residual (VERDICT r4 #3b).

    Every ATE test additionally asserts that the solver terminated at a
    first-order stationary point: the projected gradient must shrink by
    ``kkt_ratio`` relative to the initial gradient. Noise-free problems
    reach machine zero (measured ratios 1e-15..1e-14, so 1e-9 has 5-6
    orders of margin); noisy problems terminate on function tolerance in
    a flat valley and get a looser per-test ratio. A wrong stationary
    point (mis-assembled Hessian column, wrong solve) fails this check
    even when the ATE of the broken solution happens to look plausible."""
    problem = Problem(prob["trajectory"], prob["measurements"])
    kkt0 = kkt_residual(problem, problem.state0)
    state, summary = solve(problem, **kwargs)
    kkt = kkt_residual(problem, state)
    assert kkt <= kkt_ratio * kkt0 + 1e-12, (kkt, kkt0, kkt / kkt0)
    problem.write_back(state)
    return summary


def test_config1_gyro_only_so3_orientation_recovered():
    prob = make_gyro_problem(duration=3.0, rate=100.0, seed=1, sigma_q=0.05)
    aoe0 = trajectory_aoe(prob["true_trajectory"], prob["trajectory"], 0.5, 3.5)
    summary = _solve_and_write_back(prob, max_iterations=30)
    aoe = trajectory_aoe(prob["true_trajectory"], prob["trajectory"], 0.5, 3.5)
    assert summary.final_cost < 1e-10 * summary.initial_cost
    assert aoe < 1e-6, (aoe0, aoe)


def test_config2_imu_fusion_position_recovered():
    prob = make_imu_problem(
        duration=3.0, rate=100.0, seed=2, position_rate=5.0
    )
    summary = _solve_and_write_back(prob, max_iterations=40)
    ate = trajectory_ate(prob["true_trajectory"], prob["trajectory"], 0.5, 3.5)
    assert ate < 1e-4, ate
    # biases are estimated too
    b_g = np.asarray(prob["imu"].gyroscope_bias)
    b_a = np.asarray(prob["imu"].accelerometer_bias)
    rng = np.random.default_rng(2 + 7)
    true_ab = rng.normal(scale=0.05, size=3)
    true_gb = rng.normal(scale=0.01, size=3)
    np.testing.assert_allclose(b_a, true_ab, atol=1e-4)
    np.testing.assert_allclose(b_g, true_gb, atol=1e-5)


def test_config3_global_shutter_sfm_sim3_ate():
    # Global shutter: readout plays no role in the model when v-dependence
    # is zero; a pure-vision problem leaves sim3 gauge free.
    prob = make_rsvi_problem(
        nviews=8, nlandmarks=20, imu_rate=0.0, seed=3, perturb_rho=0.1,
        sigma_p=0.02, sigma_q=0.01,
    )
    t1, t2 = prob["views"][0].t0, prob["views"][-1].t0
    summary = _solve_and_write_back(prob, max_iterations=40)
    ate = trajectory_ate(
        prob["true_trajectory"], prob["trajectory"], t1, t2, align="sim3"
    )
    assert summary.final_cost < 1e-10 * summary.initial_cost
    assert ate < 1e-4, ate


@pytest.mark.parametrize("trajectory", ["split", "se3"])
def test_config4_rsvi_se3_ate(trajectory):
    prob = make_rsvi_problem(
        nviews=8, nlandmarks=16, imu_rate=60.0, seed=4, perturb_rho=0.05,
        trajectory=trajectory,
    )
    t1, t2 = prob["views"][0].t0, prob["views"][-1].t0
    summary = _solve_and_write_back(prob, max_iterations=40)
    ate = trajectory_ate(
        prob["true_trajectory"], prob["trajectory"], t1, t2, align="se3"
    )
    assert ate < 1e-4, ate


def test_rsvi_with_pixel_noise_ate_reasonable():
    """With 1 px observation noise the fit should still land close to the
    truth (regression guard for robust-loss + trust-region behavior)."""
    prob = make_rsvi_problem(
        nviews=8, nlandmarks=24, imu_rate=100.0, seed=5, noise_px=1.0,
        perturb_rho=0.05,
    )
    t1, t2 = prob["views"][0].t0, prob["views"][-1].t0
    # noisy minimum: LM terminates on function tolerance while crawling a
    # flat valley — measured KKT ratio 1.8e-3 at these settings; 2e-2
    # still rejects gross wrongness (a bad gradient leaves ratio O(1))
    _solve_and_write_back(prob, max_iterations=40, kkt_ratio=2e-2)
    ate = trajectory_ate(
        prob["true_trajectory"], prob["trajectory"], t1, t2, align="se3"
    )
    assert ate < 5e-3, ate
