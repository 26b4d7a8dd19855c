"""Camera model oracles (mirrors /root/reference/python/tests/test_cameras.py):
project/unproject inverse + analytic-vs-numeric projection derivative."""
import sys
from pathlib import Path

import numpy as np
import pytest
from numpy.testing import assert_almost_equal, assert_equal

sys.path.insert(0, str(Path(__file__).parent))
from fixtures.camera_fixtures import (  # noqa: F401
    ATAN_GAMMA,
    ATAN_K,
    ATAN_WC,
    CAMERA_READOUT,
    IMAGE_COLS,
    IMAGE_ROWS,
    atan_camera,
    camera,
    pinhole_camera,
)

from kontiki_tpu.sensors import AtanCamera


def random_image_point(camera):
    return np.array(
        [np.random.uniform(0, camera.cols), np.random.uniform(0, camera.rows)]
    )


def central_derivative(func, x0, dx=1e-3):
    return (func(x0 + dx) - func(x0 - dx)) / (2 * dx)


def test_basic(camera):
    assert camera.readout == CAMERA_READOUT
    assert camera.rows == IMAGE_ROWS
    assert camera.cols == IMAGE_COLS
    camera.readout = 0.02
    assert camera.readout == 0.02
    camera.rows = 720
    assert camera.rows == 720
    camera.cols = 1280
    assert camera.cols == 1280


def test_project_unproject(camera):
    y = random_image_point(camera)
    X = camera.unproject(y) * np.random.uniform(0.01, 10)
    assert_almost_equal(camera.project(X), y)


def test_derivative(camera):
    y = random_image_point(camera)
    X = camera.unproject(y) * np.random.uniform(3, 10)
    dX = X + np.random.normal(size=3)

    _, dy = camera.evaluate_projection(X, dX, True)

    f_jac = np.empty((2, 3))
    for fi, xi in np.ndindex(f_jac.shape):
        def func(x):
            X0 = np.copy(X)
            X0[xi] = x
            return camera.project(X0)[fi]

        f_jac[fi, xi] = central_derivative(func, X[xi])
    assert_almost_equal(f_jac @ dX, dy, decimal=3)


def test_pinhole(pinhole_camera):
    K = np.random.uniform(0.1, 20, size=(3, 3)) + np.eye(3)
    pinhole_camera.camera_matrix = K
    assert np.allclose(pinhole_camera.camera_matrix, K)


def test_atan(atan_camera):
    K = np.random.uniform(0.1, 20, size=(3, 3)) + np.eye(3)
    atan_camera.camera_matrix = K
    assert np.allclose(atan_camera.camera_matrix, K)
    wc = np.random.uniform(-1, 1, size=2)
    atan_camera.wc = wc
    assert np.allclose(atan_camera.wc, wc)
    gamma = np.random.uniform(0, 1)
    atan_camera.gamma = gamma
    assert atan_camera.gamma == gamma


def test_atan_create_unproject():
    cam1 = AtanCamera(IMAGE_ROWS, IMAGE_COLS, CAMERA_READOUT, ATAN_K, ATAN_WC, ATAN_GAMMA)
    test_project_unproject(cam1)

    cam2 = AtanCamera(IMAGE_ROWS, IMAGE_COLS, CAMERA_READOUT)
    cam2.camera_matrix = ATAN_K
    cam2.wc = ATAN_WC
    cam2.gamma = ATAN_GAMMA
    assert_equal(cam2.camera_matrix, cam1.camera_matrix)
    assert_equal(cam2.wc, cam1.wc)
    assert cam2.gamma == cam1.gamma
    test_project_unproject(cam2)
