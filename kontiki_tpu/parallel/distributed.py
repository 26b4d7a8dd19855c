"""Multi-host (pod-scale) scaffolding: jax.distributed + mesh over hosts.

The reference is a single-process library; SURVEY §5 prescribes the
TPU-native equivalent: ``jax.distributed.initialize()`` across hosts,
collectives over ICI within a slice and DCN across slices. This module is
the entry point for that path. On a real pod each host runs the same
program; ``initialize()`` wires the processes together and
``global_mesh()`` builds a measurement-axis mesh over *all* devices in the
job (local + remote). Every sharded solver in :mod:`kontiki_tpu.parallel`
then works unchanged: ``shard_map``/psum compile to ICI/DCN collectives
exactly as they compile to ICI on a single host.

Single-host processes (tests, the driver's dryrun) skip initialization and
get the local-device mesh, so the same code path runs everywhere.

Environment:
    KONTIKI_DISTRIBUTED=1           opt in to jax.distributed.initialize()
    KONTIKI_COORDINATOR=host:port   coordinator address (else JAX defaults)
    KONTIKI_NUM_PROCESSES, KONTIKI_PROCESS_ID   (else JAX auto-detection,
        which works on Cloud TPU pods out of the box)
"""
import os

import jax
import numpy as np
from jax.sharding import Mesh

from . import MEASUREMENT_AXIS

__all__ = ["initialize", "global_mesh", "is_multiprocess"]

_initialized = False


def initialize():
    """Initialize multi-host JAX if requested via KONTIKI_DISTRIBUTED=1.

    Safe to call multiple times and from single-host runs (no-op there).
    Returns True when running multi-process."""
    global _initialized
    if _initialized:
        return is_multiprocess()
    # A bootstrap may have wired the job before importing this package
    # (jax.distributed.initialize must precede the first backend touch, and
    # importing kontiki_tpu builds jnp constants): detect and adopt it.
    # Prefer the public API; fall back to the private client handle on
    # older JAX, and warn if neither detection path works.
    try:
        already = jax.distributed.is_initialized()
    except AttributeError:
        try:
            from jax._src.distributed import global_state as _gs

            already = _gs.client is not None
        except Exception:
            import warnings

            warnings.warn(
                "kontiki_tpu.parallel.distributed: cannot detect whether "
                "jax.distributed is already initialized on this JAX "
                "version; proceeding as if it is not"
            )
            already = False
    if already:
        _initialized = True
        return is_multiprocess()
    if os.environ.get("KONTIKI_DISTRIBUTED", "0") not in ("1", "true"):
        _initialized = True
        return False
    kwargs = {}
    if os.environ.get("KONTIKI_COORDINATOR"):
        kwargs["coordinator_address"] = os.environ["KONTIKI_COORDINATOR"]
    if os.environ.get("KONTIKI_NUM_PROCESSES"):
        kwargs["num_processes"] = int(os.environ["KONTIKI_NUM_PROCESSES"])
    if os.environ.get("KONTIKI_PROCESS_ID"):
        kwargs["process_id"] = int(os.environ["KONTIKI_PROCESS_ID"])
    jax.distributed.initialize(**kwargs)
    _initialized = True
    return True


def is_multiprocess():
    return jax.process_count() > 1


def global_mesh(axis_name=MEASUREMENT_AXIS):
    """1-D mesh over every device in the job (all hosts).

    On a pod this spans hosts: psum over the axis rides ICI within a slice
    and DCN across slices, chosen by the XLA partitioner. Single-host, it
    is exactly ``default_mesh()``."""
    initialize()
    return Mesh(np.array(jax.devices()), (axis_name,))


def process_local_rows(n_rows):
    """The [start, stop) row range this process should *materialize* when
    building a problem whose measurements are produced per-host (e.g. each
    host loads its own sensor log shard). Padding/jax.make_array_from_
    single_device_arrays assembly is the caller's concern; this just splits
    evenly in process order."""
    p = jax.process_index()
    n = jax.process_count()
    per = (n_rows + n - 1) // n
    return min(p * per, n_rows), min((p + 1) * per, n_rows)
