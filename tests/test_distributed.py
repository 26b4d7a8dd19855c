"""Multi-host scaffolding: the single-host degenerate path must work so the
code path exists when real pods appear (SURVEY §5)."""
import jax
import numpy as np

from kontiki_tpu.parallel import default_mesh, distributed


def test_initialize_noop_single_host(monkeypatch):
    monkeypatch.delenv("KONTIKI_DISTRIBUTED", raising=False)
    assert distributed.initialize() is False
    assert not distributed.is_multiprocess()


def test_global_mesh_spans_local_devices():
    mesh = distributed.global_mesh()
    assert mesh.devices.size == len(jax.devices())
    assert mesh.axis_names == ("m",)


def test_global_mesh_runs_sharded_solver():
    from kontiki_tpu import parallel
    from kontiki_tpu.solver.problem import Problem
    from kontiki_tpu.synthetic import make_imu_problem

    prob = make_imu_problem(duration=2.0, rate=60.0, seed=6)
    problem = Problem(prob["trajectory"], prob["measurements"])
    mesh = distributed.global_mesh()
    step, cost = parallel.make_sharded_step(problem, mesh)
    out = step(problem.state0, 1e-4)
    assert float(out[2]) < float(out[0])


def test_process_local_rows_partition():
    a, b = distributed.process_local_rows(103)
    assert (a, b) == (0, 103)  # single process owns everything
