"""HDF5 persistence, schema-compatible with the reference's ``kontiki.io``
(/root/reference/python/kontiki/io.py) so structures and trajectories can be
exchanged with reference Kontiki (e.g. for ATE comparison):

- structure group: views/{frame_nr,t0}, landmarks/{inverse_depth,ref_idx,
  color}, observations/{uv,lm_idx,v_idx} (index-linked arrays)
- trajectory group: 'type' tag; per-spline {dt, t0, knots}; SplitTrajectory
  as R3_spline/SO3_spline subgroups; SE3 knots stored as 4x4 matrices.
"""
from contextlib import contextmanager

import h5py
import numpy as np

from .sensors import AtanCamera
from .sfm import Landmark, View
from .trajectories import (
    SplitTrajectory,
    UniformR3SplineTrajectory,
    UniformSE3SplineTrajectory,
    UniformSO3SplineTrajectory,
)


def _read(node):
    """h5py dataset -> value (handles both old .value style data and scalars)."""
    v = node[()]
    if isinstance(v, bytes):
        return v.decode()
    return v


@contextmanager
def _create_h5_group(location, group_name):
    try:
        yield location.create_group(group_name)
    except AttributeError:
        with h5py.File(location, "w") as f:
            yield f.create_group(group_name)


@contextmanager
def _open_h5_group(location, group_name):
    try:
        yield location[group_name]
    except (AttributeError, KeyError, TypeError):
        with h5py.File(location, "r") as f:
            yield f[group_name]


def save_structure(fileobj, landmarks, *, group_name="structure", landmark_colors=None):
    """Save SfM structure (views/landmarks/observations) to HDF5."""
    with _create_h5_group(fileobj, group_name) as g:
        views = list({obs.view for lm in landmarks for obs in lm.observations})
        views.sort(key=lambda v: v.frame_nr)

        def observations():
            for lm in landmarks:
                for obs in lm.observations:
                    yield obs

        view_to_index = {v: i for i, v in enumerate(views)}
        landmark_to_index = {lm: i for i, lm in enumerate(landmarks)}
        obs_to_index = {obs: i for i, obs in enumerate(observations())}

        gviews = g.create_group("views")
        gviews["frame_nr"] = np.array([v.frame_nr for v in views], dtype="int")
        gviews["t0"] = np.array([v.t0 for v in views])

        glandmarks = g.create_group("landmarks")
        glandmarks["inverse_depth"] = np.array([lm.inverse_depth for lm in landmarks])
        glandmarks["ref_idx"] = np.array(
            [obs_to_index[lm.reference] for lm in landmarks], dtype="int"
        )

        gobs = g.create_group("observations")
        gobs["uv"] = np.vstack([obs.uv for obs in observations()])
        gobs["lm_idx"] = np.array(
            [landmark_to_index[obs.landmark] for obs in observations()], dtype="int"
        )
        gobs["v_idx"] = np.array(
            [view_to_index[obs.view] for obs in observations()], dtype="int"
        )

        if landmark_colors:
            colors = np.vstack([landmark_colors[lm] for lm in landmarks])
        else:
            colors = np.empty((0, 3))
        glandmarks["color"] = colors


def load_structure(fileobj, group_name="structure"):
    """Load SfM structure. Returns (views, landmarks, landmark_colors)."""
    with _open_h5_group(fileobj, group_name) as g:
        gviews = g["views"]
        views = [
            View(fnr, t0)
            for fnr, t0 in zip(_read(gviews["frame_nr"]), _read(gviews["t0"]))
        ]

        glandmarks = g["landmarks"]
        landmarks = [Landmark() for _ in range(len(_read(glandmarks["inverse_depth"])))]

        gobs = g["observations"]
        observations = []
        for uv, lm_idx, v_idx in zip(
            _read(gobs["uv"]), _read(gobs["lm_idx"]), _read(gobs["v_idx"])
        ):
            obs = views[v_idx].create_observation(landmarks[lm_idx], uv)
            observations.append(obs)

        for lm, invd, ref_idx in zip(
            landmarks, _read(glandmarks["inverse_depth"]), _read(glandmarks["ref_idx"])
        ):
            lm.inverse_depth = invd
            lm.reference = observations[ref_idx]

        colors = _read(glandmarks["color"])
        if len(colors) == len(landmarks):
            landmark_colors = {lm: c for lm, c in zip(landmarks, colors)}
        elif len(colors) == 0:
            landmark_colors = None
        else:
            raise IOError("Number of colors do not match!")

        return views, landmarks, landmark_colors


def _save_spline(group, spline):
    group["dt"] = spline.dt
    group["t0"] = spline.t0
    group["knots"] = np.vstack([np.expand_dims(np.asarray(v), 0) for v in spline])


def _load_spline(group, cls):
    instance = cls(float(_read(group["dt"])), float(_read(group["t0"])))
    for v in _read(group["knots"]):
        instance.append_knot(v)
    return instance


def save_trajectory(location, trajectory, group_name="trajectory"):
    """Save a trajectory (type tag + per-spline {dt, t0, knots})."""
    with _create_h5_group(location, group_name) as g:
        g["type"] = trajectory.__class__.__name__
        if type(trajectory) == SplitTrajectory:
            _save_spline(g.create_group("R3_spline"), trajectory.R3_spline)
            _save_spline(g.create_group("SO3_spline"), trajectory.SO3_spline)
        else:
            _save_spline(g, trajectory)


def load_trajectory(location, group_name="trajectory"):
    """Load a trajectory saved by save_trajectory (or reference kontiki.io)."""
    with _open_h5_group(location, group_name) as g:
        name = _read(g["type"])
        if name == "SplitTrajectory":
            r3 = _load_spline(g["R3_spline"], UniformR3SplineTrajectory)
            so3 = _load_spline(g["SO3_spline"], UniformSO3SplineTrajectory)
            return SplitTrajectory(r3, so3)
        elif name == "UniformSE3SplineTrajectory":
            return _load_spline(g, UniformSE3SplineTrajectory)
        elif name == "UniformSO3SplineTrajectory":
            return _load_spline(g, UniformSO3SplineTrajectory)
        elif name == "UniformR3SplineTrajectory":
            return _load_spline(g, UniformR3SplineTrajectory)
        raise IOError(f"Unknown trajectory type {name}")


def load_atan_camera(path):
    """Load an AtanCamera from the reference's calibration file schema."""
    with h5py.File(str(path), "r") as f:
        cols, rows = _read(f["size"])
        return AtanCamera(
            rows,
            cols,
            float(_read(f["readout"])),
            _read(f["K"]),
            _read(f["wc"]),
            float(_read(f["lgamma"])),
        )


# ---------------------------------------------------------------------------
# solver-state checkpointing (beyond the reference: SURVEY §5 prescribes
# orbax-style snapshots of (params, LM state) for long multi-host runs;
# the reference has no optimizer-state persistence at all)
# ---------------------------------------------------------------------------

def save_solver_state(location, state, *, trust_region_radius=None,
                      iteration=0, group_name="solver_state"):
    """Checkpoint a solver state pytree (+ LM trust-region state) to HDF5.

    ``state`` is the solver's state dict (knot arrays, sensor params,
    inverse depths, ...). Resuming a long solve is then
    ``solve(problem, initial_trust_region_radius=tr, ...)`` from the
    loaded state written back into the problem."""
    import numpy as np

    import jax

    with _create_h5_group(location, group_name) as group:
        for key, value in state.items():
            if isinstance(value, jax.Array) and not value.is_fully_addressable:
                # globally-sharded array in a multi-process job: gather the
                # full value to every host before materializing on host 0
                from jax.experimental import multihost_utils

                value = multihost_utils.process_allgather(value, tiled=True)
            group[key] = np.asarray(value)
        group.attrs["keys"] = ",".join(state.keys())
        group.attrs["iteration"] = int(iteration)
        group.attrs["format_version"] = 1
        if trust_region_radius is not None:
            group.attrs["trust_region_radius"] = float(trust_region_radius)


def load_solver_state(location, group_name="solver_state"):
    """Load a checkpoint: returns (state dict, meta dict)."""
    import jax.numpy as jnp

    with _open_h5_group(location, group_name) as group:
        keys = group.attrs["keys"].split(",") if group.attrs["keys"] else []
        state = {k: jnp.asarray(_read(group[k])) for k in keys}
        meta = {"iteration": int(group.attrs["iteration"])}
        if "trust_region_radius" in group.attrs:
            meta["trust_region_radius"] = float(
                group.attrs["trust_region_radius"]
            )
        return state, meta
