"""Camera sensor classes (reference: sensors/camera.h, pinhole_camera.h,
atan_camera.h + bindings camera_help.h:25-49).

``project``/``unproject``/``evaluate_projection`` operate in the **camera
coordinate frame** — the relative pose is NOT applied (same as the
reference, camera.h:59-67 and its TODO.md:2-4). Intrinsics are not
optimizable (stored in meta in the reference)."""
import jax.numpy as jnp
import numpy as np

from ..config import default_dtype
from . import camera_models as cm
from .base import Sensor


class Camera(Sensor):
    def __init__(self, rows, cols, readout):
        super().__init__()
        self.rows = int(rows)
        self.cols = int(cols)
        self.readout = float(readout)

    def evaluate_projection(self, X, dX, derive=True):
        """Project camera-frame point X with time derivative dX.

        Returns (y, dy); dy is zeros when derive=False."""
        raise NotImplementedError

    def project(self, X):
        "Project a point in the camera coordinate frame to pixels"
        y, _ = self.evaluate_projection(X, np.zeros(3), False)
        return y

    def unproject(self, y):
        "Image point -> (x, y, 1) ray in the camera coordinate frame"
        raise NotImplementedError


class PinholeCamera(Camera):
    def __init__(self, rows, cols, readout, camera_matrix=None):
        super().__init__(rows, cols, readout)
        if camera_matrix is None:
            camera_matrix = np.eye(3)
        self.camera_matrix = camera_matrix

    @property
    def camera_matrix(self):
        return self._K.copy()

    @camera_matrix.setter
    def camera_matrix(self, K):
        self._K = np.asarray(K, dtype=default_dtype).reshape(3, 3)
        self._K_inv = np.linalg.inv(self._K)

    def evaluate_projection(self, X, dX, derive=True):
        X = jnp.asarray(np.asarray(X, dtype=default_dtype))
        dX = jnp.asarray(np.asarray(dX, dtype=default_dtype))
        y, dy = cm.pinhole_evaluate(jnp.asarray(self._K), X, dX)
        return np.asarray(y), (np.asarray(dy) if derive else np.zeros(2))

    def unproject(self, y):
        y = jnp.asarray(np.asarray(y, dtype=default_dtype))
        return np.asarray(cm.pinhole_unproject(jnp.asarray(self._K_inv), y))


class AtanCamera(PinholeCamera):
    def __init__(self, rows, cols, readout, camera_matrix=None, wc=None, gamma=1.0):
        super().__init__(rows, cols, readout, camera_matrix)
        self.wc = np.zeros(2) if wc is None else wc
        self.gamma = float(gamma)

    @property
    def wc(self):
        return self._wc.copy()

    @wc.setter
    def wc(self, value):
        self._wc = np.asarray(value, dtype=default_dtype).reshape(2)

    def evaluate_projection(self, X, dX, derive=True):
        X = jnp.asarray(np.asarray(X, dtype=default_dtype))
        dX = jnp.asarray(np.asarray(dX, dtype=default_dtype))
        y, dy = cm.atan_evaluate(
            jnp.asarray(self._K), jnp.asarray(self.wc), self.gamma, X, dX
        )
        return np.asarray(y), (np.asarray(dy) if derive else np.zeros(2))

    def unproject(self, y):
        y = jnp.asarray(np.asarray(y, dtype=default_dtype))
        return np.asarray(
            cm.atan_unproject(jnp.asarray(self._K_inv), jnp.asarray(self.wc), self.gamma, y)
        )
