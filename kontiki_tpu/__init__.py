"""kontiki_tpu — a TPU-native continuous-time structure-from-motion framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
hovren/kontiki ("the continuous-time toolkit"): continuous-time trajectory
estimation from camera/IMU/pose measurements by nonlinear least squares.
Where the reference pairs C++ expression templates with Ceres autodiff, this
framework expresses state as pytrees of arrays, measurements as
structs-of-arrays, differentiation as ``jax.jacfwd`` over batched residual
kernels, and the solver as an on-device Levenberg-Marquardt loop with Schur
elimination — sharded over TPU meshes via ``jax.sharding``.
"""
from . import config  # noqa: F401  (must be first: enables x64)

__version__ = "0.9.0"

from . import constants, math, rotations, sew, utils  # noqa: F401,E402
from .trajectories import (  # noqa: F401,E402
    SplitTrajectory,
    UniformR3SplineTrajectory,
    UniformSE3SplineTrajectory,
    UniformSO3SplineTrajectory,
)
from . import _ceres  # noqa: F401,E402
from ._ceres import (  # noqa: F401,E402
    CallbackReturnType,
    IterationSummary,
    Summary,
    TerminationType,
)
from .estimator import TrajectoryEstimator  # noqa: F401,E402
from . import measurements, sensors, sfm  # noqa: F401,E402
