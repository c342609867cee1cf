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


def test_stereo_json_reference_wire_format_and_extrinsics(tmp_path):
    """The reference's camera JSON carries IntrinsicMatrix (3x3), written by
    ref utils/createCameraDataJSON.m:7-12 and read by ref utils/iotool.py:33;
    the loader must accept it.  Calibration-pattern extrinsics/world points
    (ref utils/getCamParams.m:11-21) round-trip when present."""
    import jax.numpy as jnp

    from cylinder_pose_estimation_tpu.utils.io import (
        load_stereo_json,
        save_stereo_json,
    )
    from cylinder_pose_estimation_tpu.utils.synthetic import default_stereo

    # A reference-style JSON (IntrinsicMatrix only, no FocalLength fields).
    ref_style = {
        "LeftCamera": {
            "IntrinsicMatrix": [[900.0, 0, 320.0], [0, 901.0, 240.0], [0, 0, 1]],
            "RadialDistortion": [0.1, -0.05],
            "TangentialDistortion": [0.001, -0.002],
        },
        "RightCamera": {
            "IntrinsicMatrix": [[905.0, 0, 322.0], [0, 906.0, 238.0], [0, 0, 1]],
            "RadialDistortion": [0.09],
            "TangentialDistortion": [],
        },
    }
    p = tmp_path / "ref_cam.json"
    p.write_text(json.dumps(ref_style))
    stereo = load_stereo_json(str(p))
    np.testing.assert_allclose(np.asarray(stereo.cam1.k)[0, 0], 900.0)
    np.testing.assert_allclose(np.asarray(stereo.cam2.k)[1, 2], 238.0)
    np.testing.assert_allclose(np.asarray(stereo.cam1.radial), [0.1, -0.05, 0.0])

    # Round-trip with calibration artifacts.
    base = default_stereo()
    pats = np.tile(np.eye(4, dtype=np.float32), (3, 1, 1))
    pats[:, 0, 3] = [1.0, 2.0, 3.0]
    full = base._replace(
        t_c1_patterns=jnp.asarray(pats),
        t_c2_patterns=jnp.asarray(pats + 0.5),
        calib_points=jnp.asarray(np.arange(12, dtype=np.float32).reshape(6, 2)),
    )
    q = tmp_path / "full_cam.json"
    save_stereo_json(str(q), full)
    back = load_stereo_json(str(q))
    np.testing.assert_allclose(np.asarray(back.t_c1_patterns), pats, rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(back.calib_points), np.asarray(full.calib_points), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(back.cam1.k), np.asarray(base.cam1.k), rtol=1e-6
    )
