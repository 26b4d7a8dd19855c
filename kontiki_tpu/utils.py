"""Time-selection helpers (reference: /root/reference/python/kontiki/utils.py)."""
import numpy as np


def safe_time(trajectory):
    "Return a time instance that the trajectory is valid for"
    tmin, tmax = trajectory.valid_time

    if np.isfinite(tmin) and np.isfinite(tmax):
        t = 0.5 * (tmin + tmax)
    else:
        if tmax <= tmin:
            raise ValueError(f"No safe time: tmax <= tmin! ({tmax} <= {tmin})")
        elif np.isfinite(tmin):
            t = tmin + 1
        elif np.isfinite(tmax):
            t = tmax - 1
        else:
            t = 42.0

    if np.isfinite(t):
        return t
    raise ValueError("No safe time: result was not finite")


def safe_time_span(trajectory, length, *, allow_shorter=False):
    "Return a time span of the given length that is valid for the trajectory"
    tmin, tmax = trajectory.valid_time

    if np.isfinite(tmin) and np.isfinite(tmax):
        max_length = tmax - tmin
        if max_length < length:
            if allow_shorter and max_length > 0:
                result = (tmin, tmax)
            else:
                raise ValueError("No safe time span: trajectory is too short")
        else:
            result = (tmin, tmin + length)
    else:
        if tmax <= tmin:
            raise ValueError(f"No safe time span: tmax <= tmin ({tmax} <= {tmin})")
        elif np.isfinite(tmin):
            result = (tmin, tmin + length)
        elif np.isfinite(tmax):
            result = (tmax - length, tmax)
        else:
            a = 42.0
            result = (a, a + length)

    if np.all(np.isfinite(result)):
        return result
    raise ValueError("No safe time span: got non-finite result")
