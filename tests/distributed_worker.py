"""Worker for the true multi-process test (launched by test_distributed.py).

Each of the N processes owns 4 virtual CPU devices; jax.distributed wires
them into one 4N-device job. Every process builds the same problem and runs
one measurement-sharded LM step over the *global* mesh — the real
cross-process path (mesh construction over non-addressable devices, psum
compiled to cross-process collectives). Process 0 prints the result as
JSON for the parent to compare against a single-process run.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
import jax.extend.backend as _jeb

_jeb.clear_backends()

# jax.distributed.initialize() must run before anything touches a backend,
# and importing kontiki_tpu builds jnp constants — so bootstrap the job
# here from the same env contract; distributed.initialize() adopts it.
jax.distributed.initialize(
    coordinator_address=os.environ["KONTIKI_COORDINATOR"],
    num_processes=int(os.environ["KONTIKI_NUM_PROCESSES"]),
    process_id=int(os.environ["KONTIKI_PROCESS_ID"]),
)

from kontiki_tpu.parallel import distributed  # noqa: E402

_IS_MULTI = distributed.initialize()

from kontiki_tpu import parallel  # noqa: E402
from kontiki_tpu.solver.problem import Problem  # noqa: E402
from kontiki_tpu.synthetic import make_imu_problem  # noqa: E402


def main():
    assert _IS_MULTI is True, "KONTIKI_DISTRIBUTED not set?"
    nproc = int(os.environ["KONTIKI_NUM_PROCESSES"])
    assert jax.process_count() == nproc, jax.process_count()
    mesh = distributed.global_mesh()
    assert mesh.devices.size == 4 * nproc, mesh.devices.size

    prob = make_imu_problem(duration=2.0, rate=60.0, seed=6)
    problem = Problem(prob["trajectory"], prob["measurements"])
    step, cost_fn = parallel.make_sharded_step(problem, mesh)
    out = step(problem.state0, 1e-4)
    jax.block_until_ready(out)
    if jax.process_index() == 0:
        print(json.dumps({
            "n_devices": mesh.devices.size,
            "n_processes": jax.process_count(),
            "cost": float(out[0]),
            "new_cost": float(out[2]),
            "pred": float(out[3]),
        }), flush=True)


if __name__ == "__main__":
    main()
