"""Knot-segment sharding (sequence parallelism): the knot axis itself is
distributed; halo exchange + halo reduce over ppermute must reproduce the
exact single-chip banded step."""
import jax
import numpy as np
import pytest

from kontiki_tpu import parallel
from kontiki_tpu.solver.banded import make_banded_step
from kontiki_tpu.solver.problem import Problem
from kontiki_tpu.synthetic import make_gyro_problem, make_imu_problem


@pytest.mark.parametrize("maker", [make_gyro_problem, make_imu_problem])
def test_segment_sharded_step_matches_banded(maker):
    prob = maker(duration=4.0, rate=60.0, seed=8)
    problem = Problem(prob["trajectory"], prob["measurements"])
    mesh = parallel.default_mesh()
    banded_step, _ = make_banded_step(problem)
    seg_step, seg_cost = parallel.make_segment_sharded_step(problem, mesh)
    for lam in (1e-4, 1e-1):
        cb, sb_, ncb, pb, db, gb = banded_step(problem.state0, lam)
        cs, ss_, ncs, ps, ds, gs = seg_step(problem.state0, lam)
        np.testing.assert_allclose(float(cs), float(cb), rtol=1e-12)
        np.testing.assert_allclose(np.asarray(ds), np.asarray(db), rtol=1e-6, atol=1e-10)
        np.testing.assert_allclose(float(ncs), float(ncb), rtol=1e-8)
        np.testing.assert_allclose(float(ps), float(pb), rtol=1e-8)
        np.testing.assert_allclose(float(gs), float(gb), rtol=1e-10)


def test_segment_sharding_rejects_camera_problems():
    from kontiki_tpu.synthetic import make_rsvi_problem

    prob = make_rsvi_problem(nviews=6, nlandmarks=6, imu_rate=50.0, seed=1)
    problem = Problem(prob["trajectory"], prob["measurements"])
    mesh = parallel.default_mesh()
    with pytest.raises(ValueError):
        parallel.make_segment_sharded_step(problem, mesh)
