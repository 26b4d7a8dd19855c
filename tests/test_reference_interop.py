"""Reference-file interop: load files in the *reference's exact HDF5
layout* (hand-authored with raw h5py per /root/reference/python/kontiki/
io.py:140-232 — field names, dtypes, group nesting; NOT written by our own
writer), then re-save and compare the structural tree. Guards against a
schema drift that own-writer/own-reader round-trips can never catch
(VERDICT r3 missing #2)."""
import h5py
import numpy as np
import pytest

from kontiki_tpu.io import (
    load_atan_camera,
    load_structure,
    load_trajectory,
    save_structure,
    save_trajectory,
)
from kontiki_tpu.rotations import quat_to_rotation_matrix
from kontiki_tpu.trajectories import (
    SplitTrajectory,
    UniformR3SplineTrajectory,
    UniformSE3SplineTrajectory,
    UniformSO3SplineTrajectory,
)


def _h5_tree(node, prefix=""):
    """{path: (kind, shape, dtype.kind)} for every dataset under node."""
    out = {}
    for name, item in node.items():
        path = f"{prefix}/{name}"
        if isinstance(item, h5py.Group):
            out[path] = ("group", None, None)
            out.update(_h5_tree(item, path))
        else:
            out[path] = ("dataset", item.shape, item.dtype.kind)
    return out


# --- hand-authored structure file (io.py:140-177 writer layout) ----------

def _author_reference_structure(path):
    """3 views, 2 landmarks, 5 observations; exactly the arrays the
    reference's __save_structure_impl emits."""
    with h5py.File(path, "w") as f:
        g = f.create_group("structure")
        gviews = g.create_group("views")
        gviews["frame_nr"] = np.array([0, 1, 2], dtype="int")
        gviews["t0"] = np.array([0.0, 1 / 30.0, 2 / 30.0])
        glm = g.create_group("landmarks")
        glm["inverse_depth"] = np.array([0.25, 0.7])
        # observations are enumerated landmark-major (lm0: obs 0..2,
        # lm1: obs 3..4); reference obs of lm0 is its first, of lm1 its last
        glm["ref_idx"] = np.array([0, 4], dtype="int")
        glm["color"] = np.empty((0, 3))
        gobs = g.create_group("observations")
        gobs["uv"] = np.array(
            [[10.0, 20.0], [11.5, 21.5], [12.0, 22.0], [100.0, 200.0], [101.0, 201.0]]
        )
        gobs["lm_idx"] = np.array([0, 0, 0, 1, 1], dtype="int")
        gobs["v_idx"] = np.array([0, 1, 2, 1, 2], dtype="int")


def test_load_reference_authored_structure(tmp_path):
    path = tmp_path / "ref_structure.h5"
    _author_reference_structure(path)
    views, landmarks, colors = load_structure(path)
    assert colors is None
    assert [v.frame_nr for v in views] == [0, 1, 2]
    assert len(landmarks) == 2
    np.testing.assert_allclose(
        [lm.inverse_depth for lm in landmarks], [0.25, 0.7]
    )
    lm0, lm1 = landmarks
    assert len(lm0.observations) == 3 and len(lm1.observations) == 2
    # reference designation survives the index indirection
    np.testing.assert_allclose(lm0.reference.uv, [10.0, 20.0])
    np.testing.assert_allclose(lm1.reference.uv, [101.0, 201.0])
    assert lm1.reference.view is views[2]


def test_structure_resave_matches_reference_layout(tmp_path):
    ref = tmp_path / "ref.h5"
    ours = tmp_path / "resaved.h5"
    _author_reference_structure(ref)
    views, landmarks, _ = load_structure(ref)
    save_structure(ours, landmarks)
    with h5py.File(ref, "r") as fr, h5py.File(ours, "r") as fo:
        tr, to = _h5_tree(fr), _h5_tree(fo)
        assert tr.keys() == to.keys()
        for k in tr:
            assert tr[k] == to[k], f"{k}: {tr[k]} != {to[k]}"
        # values: every index-linked array round-trips exactly
        for ds in ["views/frame_nr", "views/t0", "landmarks/inverse_depth",
                   "landmarks/ref_idx", "observations/uv",
                   "observations/lm_idx", "observations/v_idx"]:
            np.testing.assert_array_equal(
                fr[f"structure/{ds}"][()], fo[f"structure/{ds}"][()], err_msg=ds
            )


# --- hand-authored trajectory files (io.py:52-103, 211-232) --------------

def _author_r3(g):
    g["dt"] = 0.75
    g["t0"] = -0.5
    g["knots"] = np.arange(18, dtype=float).reshape(6, 3) / 7.0


def _author_so3(g):
    rng = np.random.RandomState(11)
    q = rng.standard_normal((6, 4))
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    g["dt"] = 0.6
    g["t0"] = 0.1
    g["knots"] = q  # wxyz rows, the binding converter layout


def _author_se3(g):
    rng = np.random.RandomState(12)
    knots = []
    for _ in range(6):
        q = rng.standard_normal(4)
        q /= np.linalg.norm(q)
        T = np.eye(4)
        T[:3, :3] = quat_to_rotation_matrix(q)
        T[:3, 3] = rng.uniform(-2, 2, 3)
        knots.append(T)
    g["dt"] = 1.1
    g["t0"] = 0.0
    g["knots"] = np.stack(knots)  # validated 4x4 matrices


AUTHORS = {
    "UniformR3SplineTrajectory": (_author_r3, UniformR3SplineTrajectory),
    "UniformSO3SplineTrajectory": (_author_so3, UniformSO3SplineTrajectory),
    "UniformSE3SplineTrajectory": (_author_se3, UniformSE3SplineTrajectory),
}


@pytest.mark.parametrize("name", list(AUTHORS))
def test_load_reference_authored_trajectory(tmp_path, name):
    author, cls = AUTHORS[name]
    path = tmp_path / "traj.h5"
    with h5py.File(path, "w") as f:
        g = f.create_group("trajectory")
        g["type"] = name  # scalar str dataset, as the reference writes it
        author(g)
    traj = load_trajectory(path)
    assert isinstance(traj, cls)
    with h5py.File(path, "r") as f:
        g = f["trajectory"]
        assert traj.dt == pytest.approx(g["dt"][()])
        assert traj.t0 == pytest.approx(g["t0"][()])
        ref_knots = g["knots"][()]
    assert len(traj) == len(ref_knots)
    tol = 1e-12 if name != "UniformSE3SplineTrajectory" else 1e-9
    for i in range(len(traj)):
        np.testing.assert_allclose(
            np.asarray(traj[i]), ref_knots[i], atol=tol
        )
    # evaluable in its valid range
    t = (traj.min_time + traj.max_time) / 2
    assert np.all(np.isfinite(traj.position(t)))


def test_load_reference_authored_split_trajectory(tmp_path):
    path = tmp_path / "split.h5"
    with h5py.File(path, "w") as f:
        g = f.create_group("trajectory")
        g["type"] = "SplitTrajectory"
        _author_r3(g.create_group("R3_spline"))
        _author_so3(g.create_group("SO3_spline"))
    traj = load_trajectory(path)
    assert isinstance(traj, SplitTrajectory)
    assert traj.R3_spline.dt == pytest.approx(0.75)
    assert traj.SO3_spline.dt == pytest.approx(0.6)
    t = (traj.min_time + traj.max_time) / 2
    assert np.isfinite(traj.orientation(t)).all()


@pytest.mark.parametrize(
    "kind", ["UniformR3SplineTrajectory", "UniformSO3SplineTrajectory",
             "UniformSE3SplineTrajectory", "SplitTrajectory"]
)
def test_trajectory_resave_matches_reference_layout(tmp_path, kind):
    ref = tmp_path / "ref.h5"
    ours = tmp_path / "resaved.h5"
    with h5py.File(ref, "w") as f:
        g = f.create_group("trajectory")
        g["type"] = kind
        if kind == "SplitTrajectory":
            _author_r3(g.create_group("R3_spline"))
            _author_so3(g.create_group("SO3_spline"))
        else:
            AUTHORS[kind][0](g)
    save_trajectory(ours, load_trajectory(ref))
    with h5py.File(ref, "r") as fr, h5py.File(ours, "r") as fo:
        tr, to = _h5_tree(fr), _h5_tree(fo)
        assert tr.keys() == to.keys()
        for k in tr:
            assert tr[k] == to[k], f"{k}: {tr[k]} != {to[k]}"


# --- atan calibration file (reference io.py:106-114 reader layout) -------

def test_load_reference_authored_atan_camera(tmp_path):
    from fixtures.camera_fixtures import (
        ATAN_GAMMA,
        ATAN_K,
        ATAN_WC,
        CAMERA_READOUT,
        IMAGE_COLS,
        IMAGE_ROWS,
    )

    path = tmp_path / "camera.h5"
    with h5py.File(path, "w") as f:
        f["size"] = np.array([IMAGE_COLS, IMAGE_ROWS])  # (cols, rows)!
        f["readout"] = CAMERA_READOUT
        f["K"] = ATAN_K
        f["wc"] = ATAN_WC
        f["lgamma"] = ATAN_GAMMA
    cam = load_atan_camera(path)
    assert cam.rows == IMAGE_ROWS and cam.cols == IMAGE_COLS
    assert cam.readout == pytest.approx(CAMERA_READOUT)
    np.testing.assert_allclose(cam.camera_matrix, ATAN_K)
    # project/unproject consistency on the loaded calibration
    y = np.array([700.0, 400.0])
    X = cam.unproject(y) * 3.0
    np.testing.assert_allclose(cam.project(X), y, atol=1e-9)
