"""Matrix-free iterative Schur (PCG) must reproduce the exact damped
solve: with a tight CG tolerance the step equals the dense/Schur step to
solver precision, while never materializing H_cc or E."""
import numpy as np
import pytest

from kontiki_tpu.solver.iterative import make_iterative_step
from kontiki_tpu.solver.kernels import make_step
from kontiki_tpu.solver.problem import Problem
from kontiki_tpu.solver.schur import make_schur_step
from kontiki_tpu.synthetic import make_imu_problem, make_rsvi_problem


@pytest.fixture(scope="module")
def camera_structure():
    return make_rsvi_problem(nviews=6, nlandmarks=12, imu_rate=60.0, seed=9)


@pytest.fixture(scope="module")
def camera_problem(camera_structure):
    return Problem(
        camera_structure["trajectory"], camera_structure["measurements"]
    )


def test_iterative_step_matches_schur(camera_problem):
    schur_step, _ = make_schur_step(camera_problem)
    it_step, _ = make_iterative_step(camera_problem, cg_tol=1e-14, cg_maxiter=2000)
    for lam in (1e-4, 1e-1):
        cs, ss, ncs, ps, ds, gs = schur_step(camera_problem.state0, lam)
        ci, si, nci, pi, di, gi = it_step(camera_problem.state0, lam)
        np.testing.assert_allclose(float(ci), float(cs), rtol=1e-12)
        np.testing.assert_allclose(
            np.asarray(di), np.asarray(ds), rtol=1e-5, atol=1e-9
        )
        np.testing.assert_allclose(float(nci), float(ncs), rtol=1e-6)
        np.testing.assert_allclose(float(pi), float(ps), rtol=1e-6)
        np.testing.assert_allclose(float(gi), float(gs), rtol=1e-10)


def test_iterative_step_matches_dense_no_landmarks():
    prob = make_imu_problem(duration=2.5, rate=60.0, seed=4)
    problem = Problem(prob["trajectory"], prob["measurements"])
    dense_step, _ = make_step(problem)
    it_step, _ = make_iterative_step(problem, cg_tol=1e-14, cg_maxiter=2000)
    cd, sd, ncd, pd, dd, gd = dense_step(problem.state0, 1e-3)
    ci, si, nci, pi, di, gi = it_step(problem.state0, 1e-3)
    np.testing.assert_allclose(float(ci), float(cd), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(di), np.asarray(dd), rtol=1e-5, atol=1e-9)
    np.testing.assert_allclose(float(pi), float(pd), rtol=1e-6)


def test_iterative_solver_converges(camera_problem):
    """A loose, production-style CG tolerance still drives LM to the fit."""
    from kontiki_tpu.solver.lm import make_fused_solver

    solver = make_fused_solver(
        camera_problem, max_iterations=30, strategy="iterative_schur"
    )
    state, cost, it = solver(camera_problem.state0)
    _, cost_fn = make_schur_step(camera_problem)
    c0 = float(cost_fn(camera_problem.state0))
    assert float(cost) < 1e-8 * c0


# ---------------------------------------------------------------------------
# multi-chip iterative Schur (8-device CPU mesh) + config-5 scale
# ---------------------------------------------------------------------------

def test_sharded_iterative_step_matches_single(camera_problem):
    import jax

    from kontiki_tpu import parallel

    mesh = parallel.default_mesh()
    assert mesh.devices.size == 8
    it_step, _ = make_iterative_step(camera_problem, cg_tol=1e-14, cg_maxiter=2000)
    sh_step, _ = parallel.make_sharded_iterative_step(
        camera_problem, mesh, cg_tol=1e-14, cg_maxiter=2000
    )
    c1, s1, nc1, p1, d1, g1 = it_step(camera_problem.state0, 1e-3)
    c8, s8, nc8, p8, d8, g8 = sh_step(camera_problem.state0, 1e-3)
    np.testing.assert_allclose(float(c8), float(c1), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(d8), np.asarray(d1), rtol=1e-5, atol=1e-9)
    np.testing.assert_allclose(float(p8), float(p1), rtol=1e-6)
    np.testing.assert_allclose(float(g8), float(g1), rtol=1e-10)


def test_sharded_iterative_scale_raw_problem():
    """Config-5 shape at CPU-test scale: a RawProblem with hundreds of knots
    and thousands of landmarks runs a full sharded LM solve without any
    dense [Pc,Pc] or [L,Pc] allocation and reduces the cost massively."""
    from kontiki_tpu import parallel
    from kontiki_tpu.synthetic import make_big_ba_problem, trajectory_ate

    big = make_big_ba_problem(
        n_views=120,
        n_landmarks=2000,
        obs_per_landmark=4,
        knot_dt=0.1,
        seed=1,
        sigma_p=0.01,
        sigma_q=0.005,
        perturb_rho=0.02,
    )
    problem = big["problem"]
    assert problem.num_tangent > 2000  # knots + landmarks
    mesh = parallel.default_mesh()
    solver = parallel.make_sharded_iterative_solver(
        problem, mesh, max_iterations=12, cg_tol=1e-8, cg_maxiter=150
    )
    state, cost, it = solver(problem.state0)
    step, cost_fn = parallel.make_sharded_iterative_step(problem, mesh)
    c0 = float(cost_fn(problem.state0))
    assert float(cost) < 1e-6 * c0, (float(cost), c0)
