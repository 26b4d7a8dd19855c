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


def test_two_process_sharded_step():
    """A real 2-process jax.distributed run: spawn two CPU processes (4
    virtual devices each), build the 8-device global mesh, run one
    measurement-sharded LM step, and pin equality against the same step in
    this (single-process) test over its local 8-device mesh."""
    import json
    import os
    import socket
    import subprocess
    import sys

    from kontiki_tpu import parallel
    from kontiki_tpu.solver.problem import Problem
    from kontiki_tpu.synthetic import make_imu_problem

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    worker = os.path.join(os.path.dirname(__file__), "distributed_worker.py")
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.update(
            JAX_PLATFORMS="cpu",
            XLA_FLAGS="--xla_force_host_platform_device_count=4",
            KONTIKI_DISTRIBUTED="1",
            KONTIKI_COORDINATOR=f"localhost:{port}",
            KONTIKI_NUM_PROCESSES="2",
            KONTIKI_PROCESS_ID=str(pid),
            KONTIKI_TPU_X64=os.environ.get("KONTIKI_TPU_X64", "1"),
        )
        procs.append(subprocess.Popen(
            [sys.executable, worker], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        ))
    outs = [p.communicate(timeout=600) for p in procs]
    for p, (so, se) in zip(procs, outs):
        assert p.returncode == 0, se[-2000:]
    result = json.loads(outs[0][0].strip().splitlines()[-1])
    assert result["n_processes"] == 2
    assert result["n_devices"] == 8

    # single-process reference over the local 8-device mesh
    prob = make_imu_problem(duration=2.0, rate=60.0, seed=6)
    problem = Problem(prob["trajectory"], prob["measurements"])
    step, _ = parallel.make_sharded_step(problem, parallel.default_mesh())
    ref = step(problem.state0, 1e-4)
    assert abs(result["cost"] - float(ref[0])) <= 1e-8 * float(ref[0])
    assert abs(result["new_cost"] - float(ref[2])) <= max(
        1e-6 * float(ref[2]), 1e-10
    )
