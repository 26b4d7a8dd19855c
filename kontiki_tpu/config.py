"""Global numerical configuration.

The reference library (hovren/kontiki) computes everything in C++ double
precision (Ceres only supports double). Its accuracy oracles sit at ~1e-7
absolute tolerance (see /root/reference/python/tests/trajectories/
test_spline_trajectories.py:181-219), which float32 cannot reach. We therefore
enable JAX x64 by default so the public API has reference-equivalent
semantics. Hot TPU kernels may internally downcast (mixed precision with
compensated accumulation) without changing API dtypes.

Set the environment variable ``KONTIKI_TPU_X64=0`` before importing
``kontiki_tpu`` to keep JAX's default float32 mode — the configuration used
on TPU hardware (which has no native f64).

Precision policy (validated by tests/f32_check.py, run as part of the
suite): in pure float32 the flagship rolling-shutter visual-inertial
problem converges to ~3e-6 m aligned ATE on a meter-scale trajectory —
the Schur-eliminated reduced system stays well-conditioned enough that no
compensated accumulation is required. The f64 default remains for API
parity with the reference's double-only oracles; TPU deployments run f32.
"""
import os

import jax

if os.environ.get("KONTIKI_TPU_X64", "1") != "0":
    jax.config.update("jax_enable_x64", True)

#: Default floating point dtype for user-facing state arrays.
import numpy as _np

default_dtype = _np.float64 if jax.config.jax_enable_x64 else _np.float32
