"""HDF5 round-trips (mirrors /root/reference/python/tests/test_io.py)."""
import numpy as np
import pytest

from kontiki_tpu.io import (
    load_structure,
    load_trajectory,
    save_structure,
    save_trajectory,
)
from kontiki_tpu.sfm import Landmark, View
from kontiki_tpu.trajectories import SplitTrajectory, UniformSE3SplineTrajectory


def test_trajectory_roundtrip(trajectory, tmp_path):
    path = tmp_path / "traj.h5"
    save_trajectory(path, trajectory)
    loaded = load_trajectory(path)
    assert type(loaded) is type(trajectory)

    if isinstance(trajectory, SplitTrajectory):
        pairs = [
            (trajectory.R3_spline, loaded.R3_spline),
            (trajectory.SO3_spline, loaded.SO3_spline),
        ]
    else:
        pairs = [(trajectory, loaded)]
    for orig, new in pairs:
        assert new.dt == orig.dt
        assert new.t0 == orig.t0
        assert len(new) == len(orig)
        atol = 1e-14 if not isinstance(trajectory, UniformSE3SplineTrajectory) else 1e-12
        for i in range(len(orig)):
            np.testing.assert_allclose(new[i], orig[i], atol=atol)

    t = 0.5 * (trajectory.min_time + trajectory.max_time)
    np.testing.assert_allclose(loaded.position(t), trajectory.position(t), atol=1e-9)


def test_structure_roundtrip(tmp_path):
    views = [View(i, i / 30) for i in range(4)]
    landmarks = []
    for k in range(6):
        lm = Landmark()
        lm.inverse_depth = np.random.uniform(0.01, 2)
        obs = [
            v.create_observation(lm, np.random.uniform(0, 1000, size=2))
            for v in views[k % 2 :]
        ]
        lm.reference = obs[0]
        landmarks.append(lm)

    path = tmp_path / "structure.h5"
    save_structure(path, landmarks)
    new_views, new_landmarks, colors = load_structure(path)

    assert colors is None
    assert len(new_views) == len(views)
    assert len(new_landmarks) == len(landmarks)
    for old, new in zip(landmarks, new_landmarks):
        assert new.inverse_depth == pytest.approx(old.inverse_depth)
        assert len(new.observations) == len(old.observations)
        np.testing.assert_allclose(new.reference.uv, old.reference.uv)
        assert new.reference.view.frame_nr == old.reference.view.frame_nr
    for old, new in zip(views, new_views):
        assert new.frame_nr == old.frame_nr
        assert new.t0 == pytest.approx(old.t0)


def test_structure_colors_roundtrip(tmp_path):
    views = [View(i, i / 30) for i in range(2)]
    landmarks = []
    for _ in range(3):
        lm = Landmark()
        obs = [v.create_observation(lm, np.random.uniform(0, 100, size=2)) for v in views]
        lm.reference = obs[0]
        landmarks.append(lm)
    colors = {lm: np.random.randint(0, 255, size=3) for lm in landmarks}
    path = tmp_path / "s.h5"
    save_structure(path, landmarks, landmark_colors=colors)
    _, new_landmarks, new_colors = load_structure(path)
    assert new_colors is not None
    for old, new in zip(landmarks, new_landmarks):
        np.testing.assert_allclose(new_colors[new], colors[old])


def test_solver_state_checkpoint_roundtrip(tmp_path):
    """Checkpoint/resume of (state pytree, LM trust-region state): the
    orbax-style snapshot SURVEY §5 prescribes for long runs."""
    import jax.numpy as jnp

    from kontiki_tpu import io as kio
    from kontiki_tpu.solver.lm import solve
    from kontiki_tpu.solver.problem import Problem
    from kontiki_tpu.synthetic import make_gyro_problem

    prob = make_gyro_problem(duration=2.0, rate=50.0, seed=4)
    problem = Problem(prob["trajectory"], prob["measurements"])
    state, summary = solve(problem, max_iterations=3, function_tolerance=0.0)
    tr = summary.iterations[-1].trust_region_radius

    path = str(tmp_path / "ckpt.h5")
    kio.save_solver_state(path, state, trust_region_radius=tr, iteration=3)
    loaded, meta = kio.load_solver_state(path)
    assert meta["iteration"] == 3
    assert meta["trust_region_radius"] == tr
    assert set(loaded) == set(state)
    for k in state:
        np.testing.assert_array_equal(np.asarray(loaded[k]), np.asarray(state[k]))

    # resume: write the checkpointed state back and continue the solve
    problem.write_back(loaded)
    problem2 = Problem(prob["trajectory"], prob["measurements"])
    state2, summary2 = solve(
        problem2, max_iterations=10, initial_trust_region_radius=tr,
        function_tolerance=0.0,
    )
    assert summary2.final_cost <= summary.final_cost * (1 + 1e-9)


def test_solve_trace_dir(tmp_path):
    """trace_dir writes a jax.profiler trace of the solve."""
    import os

    from kontiki_tpu.solver.lm import solve
    from kontiki_tpu.solver.problem import Problem
    from kontiki_tpu.synthetic import make_gyro_problem

    prob = make_gyro_problem(duration=1.0, rate=30.0, seed=5)
    problem = Problem(prob["trajectory"], prob["measurements"])
    td = str(tmp_path / "trace")
    state, summary = solve(problem, max_iterations=2, trace_dir=td)
    assert summary.num_successful_steps >= 1
    found = []
    for root, _, files in os.walk(td):
        found += files
    assert found, "no profiler trace written"
