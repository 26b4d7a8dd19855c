"""Camera fixtures mirroring the reference test setup
(/root/reference/python/tests/fixtures/camera_fixtures.py: image geometry,
readout, and a real Atan calibration)."""
import numpy as np
import pytest

from kontiki_tpu.rotations import random_quaternion
from kontiki_tpu.sensors import AtanCamera, PinholeCamera

IMAGE_ROWS = 1080
IMAGE_COLS = 1920
CAMERA_READOUT = 0.026

ATAN_K = np.array(
    [
        [853.12703455, 0.0, 988.06311256],
        [0.0, 873.54956631, 525.71056312],
        [0.0, 0.0, 1.0],
    ]
)
ATAN_WC = np.array([0.0029110778971412417, 0.0004189670467132041])
ATAN_GAMMA = 0.8894355177968156


@pytest.fixture
def pinhole_camera():
    return PinholeCamera(IMAGE_ROWS, IMAGE_COLS, CAMERA_READOUT, np.eye(3))


@pytest.fixture
def atan_camera():
    return AtanCamera(IMAGE_ROWS, IMAGE_COLS, CAMERA_READOUT, ATAN_K, ATAN_WC, ATAN_GAMMA)


camera_classes = {PinholeCamera: "pinhole_camera", AtanCamera: "atan_camera"}


@pytest.fixture(params=list(camera_classes))
def camera(request):
    cls = request.param
    if cls is PinholeCamera:
        instance = PinholeCamera(IMAGE_ROWS, IMAGE_COLS, CAMERA_READOUT, np.eye(3))
    else:
        instance = AtanCamera(
            IMAGE_ROWS, IMAGE_COLS, CAMERA_READOUT, ATAN_K, ATAN_WC, ATAN_GAMMA
        )
    instance.relative_pose = (random_quaternion(), np.random.uniform(-1, 1, size=3))
    return instance
