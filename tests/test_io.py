"""JSON contract tests (ref utils/iotool.py, createCameraDataJSON.m, make_json)."""

import json

import numpy as np

from cylinder_pose_estimation_tpu.utils.io import (
    grid_points_from_json,
    grid_points_to_json,
    load_stereo_json,
    save_stereo_json,
)
from cylinder_pose_estimation_tpu.utils.synthetic import cylinder_grid_points, default_stereo


def test_stereo_json_roundtrip(tmp_path):
    stereo = default_stereo()
    path = str(tmp_path / "cameras.json")
    save_stereo_json(path, stereo)
    loaded = load_stereo_json(path)
    np.testing.assert_allclose(np.asarray(loaded.cam1.k), np.asarray(stereo.cam1.k), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(loaded.t_c2_c1), np.asarray(stereo.t_c2_c1), rtol=1e-6)
    # Schema matches the reference reader's field names (ref utils/iotool.py:12-19).
    with open(path) as f:
        data = json.load(f)
    for cam_key in ("LeftCamera", "RightCamera"):
        for field in ("FocalLength", "PrincipalPoint", "RadialDistortion", "TangentialDistortion"):
            assert field in data[cam_key]


def test_grid_points_json_roundtrip():
    scene = cylinder_grid_points(default_stereo(), capacity=128)
    text = grid_points_to_json(scene.gp1)
    data = json.loads(text)
    assert "center_point" in data and "points" in data
    # id format "(i,j)" like ref make_json (utils/util_cylinder.py:1717-1722)
    assert data["points"][0]["id"].startswith("(")

    gp = grid_points_from_json(text, capacity=128)
    n = int(np.asarray(scene.gp1.valid).sum())
    assert int(np.asarray(gp.valid).sum()) == n
    # Same (idx -> xy) mapping after the round trip.
    src = {
        tuple(np.asarray(scene.gp1.idx)[i]): np.asarray(scene.gp1.xy)[i]
        for i in range(128)
        if np.asarray(scene.gp1.valid)[i]
    }
    out_idx = np.asarray(gp.idx)
    out_xy = np.asarray(gp.xy)
    for i in range(128):
        if np.asarray(gp.valid)[i]:
            np.testing.assert_allclose(out_xy[i], src[tuple(out_idx[i])], rtol=1e-5)


def test_grid_points_json_accepts_bracket_ids():
    text = json.dumps(
        {
            "center_point": [10.0, 20.0],
            "points": [{"id": "[2,-3]", "x": 1.5, "y": 2.5}],
        }
    )
    gp = grid_points_from_json(text, capacity=8)
    assert int(np.asarray(gp.valid).sum()) == 1
    assert tuple(np.asarray(gp.idx)[0]) == (2, -3)
