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


def test_segment_sharded_full_solve_to_ground_truth():
    """A full LM solve through the segment-sharded path must reach the
    synthetic ground truth (not just one equal step)."""
    prob = make_gyro_problem(duration=6.0, rate=60.0, seed=21, noise=0.0)
    problem = Problem(prob["trajectory"], prob["measurements"])
    mesh = parallel.default_mesh()
    solver = parallel.make_segment_sharded_solver(
        problem, mesh, max_iterations=15, function_tolerance=0.0
    )
    st, cost, it = solver(problem.state0)
    assert float(cost) < 1e-12, float(cost)
    # knots recovered: compare orientations along the span
    problem.write_back(st)
    from kontiki_tpu.synthetic import trajectory_aoe

    t1, t2 = 0.6, 0.4 + 6.0
    aoe = trajectory_aoe(prob["true_trajectory"], prob["trajectory"], t1, t2)
    assert aoe < 1e-6, aoe


def test_segment_sharding_large_knots_memory_bounded():
    """>= 50k knots: the per-device knot shards must hold only seg knots
    (the whole point of sequence parallelism), and one sharded step must
    run and descend."""
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    dt = 0.1
    nk = 50_000
    duration = (nk - 3) * dt - 1e-6
    prob = make_gyro_problem(duration=duration, rate=20.0, knot_dt=dt, seed=9, sigma_q=0.01)
    problem = Problem(prob["trajectory"], prob["measurements"])
    assert len(prob["trajectory"].knots) >= 50_000
    mesh = parallel.default_mesh()
    n = mesh.devices.size

    from kontiki_tpu.parallel.segments import _segment_layout

    spec, spec_g, spec_l, runtime, lay = _segment_layout(problem, n)
    assert lay["nk_pad"] == lay["seg"] * n
    assert lay["seg"] <= -(-nk // n) + lay["G"]  # tight: nk/n rounded to G

    # the sharded knot array really is distributed: each device's
    # addressable shard holds exactly seg knots
    knots = jnp.zeros((lay["nk_pad"], 4))
    placed = jax.device_put(knots, NamedSharding(mesh, P(parallel.MEASUREMENT_AXIS)))
    assert {s.data.shape[0] for s in placed.addressable_shards} == {lay["seg"]}

    step, _ = parallel.make_segment_sharded_step(problem, mesh)
    out = step(problem.state0, 1.0)
    assert float(out[2]) < float(out[0])
    assert np.isfinite(np.asarray(out[4])).all()
