"""Pallas TPU kernels for the framework's hot ops.

Modules here provide hand-scheduled TPU implementations behind the same
signatures as the jnp reference paths in :mod:`kontiki_tpu.trajectories.
spline_eval`; callers select them explicitly or via ``use_pallas='auto'``
wrappers which fall back to the XLA path off-TPU.
"""
from .spline_kernels import r3_evaluate_pallas  # noqa: F401
