"""Test configuration.

Tests run on a virtual 8-device CPU mesh (the driver benches on real TPU):
multi-chip sharding code paths (pjit/collectives) are identical on the CPU
backend, per JAX's xla_force_host_platform_device_count mechanism. x64 is
required to hit the reference's ~1e-7 oracles (Ceres is double-only).

This environment pre-imports jax and registers a high-latency remote-TPU
("axon") backend via sitecustomize before conftest runs, so plain env vars
are too late — we must retarget the already-initialized runtime to CPU with
``jax.config.update`` + ``clear_backends``.
"""
import os

import jax

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
jax.config.update("jax_platforms", "cpu")
import jax.extend.backend as _jeb  # noqa: E402

_jeb.clear_backends()
assert jax.devices()[0].platform == "cpu"

import numpy as np  # noqa: E402
import pytest  # noqa: E402

import kontiki_tpu  # noqa: F401,E402  (enables x64)


@pytest.fixture(autouse=True)
def _seed():
    np.random.seed(0)
