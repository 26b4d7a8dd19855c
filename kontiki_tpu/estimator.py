"""TrajectoryEstimator: the user-facing solver facade.

API parity with the reference bindings
(/root/reference/python/src/kontiki/py_trajectory_estimator.cc:48-80 and
python/kontiki/__init__.py:11-35): construct with a trajectory,
``add_measurement``, ``add_callback(cb, update_state=False)``,
``solve(max_iterations=50, progress=True, num_threads=-1)`` returning a
Ceres-compatible Summary. Unlike the reference, problem construction is
deferred: measurements are recorded here and compiled into dense
struct-of-arrays form at solve() time ("problem compilation" replaces
AddToEstimator)."""
from ._ceres import CallbackReturnType, Summary, TerminationType  # noqa: F401
from .solver.lm import solve as _lm_solve
from .solver.problem import Problem


class TrajectoryEstimator:
    def __init__(self, trajectory):
        self._trajectory = trajectory
        self._measurements = []
        self._callbacks = []
        self._callback_needs_state = False

    @property
    def trajectory(self):
        return self._trajectory

    def add_measurement(self, m):
        self._measurements.append(m)

    def add_callback(self, callback, update_state=False):
        self._callbacks.append(callback)
        self._callback_needs_state = self._callback_needs_state or update_state

    def solve(self, max_iterations=50, progress=True, num_threads=-1, **options):
        """Compile the problem and run Levenberg-Marquardt.

        ``num_threads`` is accepted for API parity; parallelism on TPU is
        controlled by device meshes, not thread counts."""
        problem = Problem(self._trajectory, self._measurements)
        state, summary = _lm_solve(
            problem,
            max_iterations=max_iterations,
            progress=progress,
            callbacks=self._callbacks,
            callback_needs_state=self._callback_needs_state,
            **options,
        )
        problem.write_back(state)
        summary.num_threads_given = num_threads
        return summary
