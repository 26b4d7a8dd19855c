"""Schur elimination must equal the dense damped solve exactly (block
elimination of the damped normal equations is algebraically exact)."""
import numpy as np
import pytest

from kontiki_tpu.solver.kernels import make_step
from kontiki_tpu.solver.problem import Problem
from kontiki_tpu.solver.schur import make_schur_step
from kontiki_tpu.solver.lm import make_fused_solver
from kontiki_tpu.synthetic import make_rsvi_problem


@pytest.fixture(scope="module", params=["static", "lifting"])
def structure(request):
    # Keep the whole dict alive: views own the observations (reference
    # ownership semantics, view_impl.h:18-24) and Problem reconstruction
    # needs them.
    return make_rsvi_problem(
        nviews=6, nlandmarks=12, imu_rate=60.0, rs=request.param, seed=9
    )


@pytest.fixture(scope="module")
def problem(structure):
    return Problem(structure["trajectory"], structure["measurements"])


def test_schur_step_equals_dense_step(problem):
    dense_step, _ = make_step(problem)
    schur_step, _ = make_schur_step(problem)
    for lam in (1e-6, 1e-2, 1.0):
        cd, sd, ncd, pd, dd, gd = dense_step(problem.state0, lam)
        cs, ss, ncs, ps, ds, gs = schur_step(problem.state0, lam)
        np.testing.assert_allclose(float(cs), float(cd), rtol=1e-12)
        np.testing.assert_allclose(np.asarray(ds), np.asarray(dd), rtol=1e-6, atol=1e-10)
        np.testing.assert_allclose(float(ncs), float(ncd), rtol=1e-8)
        np.testing.assert_allclose(float(ps), float(pd), rtol=1e-8)
        np.testing.assert_allclose(float(gs), float(gd), rtol=1e-10)


def test_schur_respects_locked_landmark():
    # Fresh structure: locking must not leak into the module-scoped fixture.
    own = make_rsvi_problem(nviews=6, nlandmarks=12, imu_rate=60.0, seed=9)
    p1 = Problem(own["trajectory"], own["measurements"])
    for lm in p1.landmarks[:3]:
        lm.locked = True
    p2 = Problem(own["trajectory"], own["measurements"])
    schur_step, _ = make_schur_step(p2)
    out = schur_step(p2.state0, 1e-3)
    delta = np.asarray(out[4])
    lo = p2.landmark_offset
    assert np.all(delta[lo:lo + 3] == 0.0)
    assert np.any(delta[lo + 3:lo + len(p2.landmarks)] != 0.0)


def test_fused_solver_uses_schur_and_converges(problem):
    solver = make_fused_solver(problem, max_iterations=25, strategy="schur")
    state, cost, it = solver(problem.state0)
    _, cost_fn = make_schur_step(problem)
    c0 = float(cost_fn(problem.state0))
    assert float(cost) < 1e-8 * c0
