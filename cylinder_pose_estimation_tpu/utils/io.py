"""Host-side I/O preserving the reference's JSON contracts.

Two wire formats cross the reference's language boundary and are kept
bit-compatible here (SURVEY.md §1 data contract):

  * camera JSON ``{"LeftCamera": {...}, "RightCamera": {...}}`` with
    FocalLength, PrincipalPoint, RadialDistortion, TangentialDistortion
    (written by ref utils/createCameraDataJSON.m:7-12, read by
    ref utils/iotool.py:8-20);
  * grid-point JSON ``{"center_point": [x, y], "points": [{"id": "(i,j)",
    "x": ..., "y": ...}, ...]}`` (ref utils/util_cylinder.py:1674-1727
    make_json; parsed into the N x 4 [x, y, x_index, y_index] matrix by
    ref utils/pointsStruct2mat.m:20-30).

These functions are the only host/JSON touchpoints; everything device-side
works on the dense GridPoints pytree.
"""

from __future__ import annotations

import json
import re
from typing import Dict, Tuple

import numpy as np

import jax.numpy as jnp

from cylinder_pose_estimation_tpu.types import CameraModel, GridPoints, StereoParams


def camera_from_dict(d: Dict) -> CameraModel:
    """Build intrinsics from one camera's JSON dict.

    The reference wire format carries the full 3x3 ``IntrinsicMatrix``
    (written standard-row-major by ref utils/createCameraDataJSON.m:7-12 --
    note the MATLAB transpose -- and read by ref utils/iotool.py:33); older
    variants carry FocalLength/PrincipalPoint pairs.  Accept both.
    """
    if "IntrinsicMatrix" in d:
        k = jnp.asarray(np.asarray(d["IntrinsicMatrix"], np.float32))
    else:
        fx, fy = d["FocalLength"]
        cx, cy = d["PrincipalPoint"]
        k = jnp.array(
            [[fx, 0.0, cx], [0.0, fy, cy], [0.0, 0.0, 1.0]], jnp.float32
        )
    radial = np.zeros(3, np.float32)
    rd = np.asarray(d.get("RadialDistortion", []), np.float32).ravel()
    radial[: rd.shape[0]] = rd[:3]
    tang = np.zeros(2, np.float32)
    td = np.asarray(d.get("TangentialDistortion", []), np.float32).ravel()
    tang[: td.shape[0]] = td[:2]
    return CameraModel(k=k, radial=jnp.asarray(radial), tangential=jnp.asarray(tang))


def load_camera_json(path: str) -> Tuple[CameraModel, CameraModel]:
    """Load the Left/Right camera JSON (ref utils/iotool.py:8-20)."""
    with open(path) as f:
        data = json.load(f)
    return camera_from_dict(data["LeftCamera"]), camera_from_dict(data["RightCamera"])


def load_stereo_json(path: str) -> StereoParams:
    """Camera JSON extended with the stereo extrinsics.

    The reference keeps T_C2_C1 inside the MATLAB stereoParams .mat only
    (ref utils/getCamParams.m:9); our schema adds an optional
    ``PoseCamera2`` 4x4 (row-major list) so a single JSON describes the rig.
    Falls back to identity if absent.
    """
    with open(path) as f:
        data = json.load(f)
    cam1 = camera_from_dict(data["LeftCamera"])
    cam2 = camera_from_dict(data["RightCamera"])
    t = jnp.asarray(
        np.asarray(data.get("PoseCamera2", np.eye(4).tolist()), np.float32)
    )

    def opt(key):
        v = data.get(key)
        return None if v is None else jnp.asarray(np.asarray(v, np.float32))

    return StereoParams(
        cam1=cam1,
        cam2=cam2,
        t_c2_c1=t,
        # Calibration-session artifacts (ref utils/getCamParams.m:11-21).
        t_c1_patterns=opt("PatternExtrinsics1"),
        t_c2_patterns=opt("PatternExtrinsics2"),
        calib_points=opt("WorldPoints"),
    )


def save_stereo_json(path: str, stereo: StereoParams) -> None:
    """Inverse of load_stereo_json, using the reference field names."""

    def cam_dict(cam: CameraModel) -> Dict:
        k = np.asarray(cam.k)
        return {
            # The reference wire field (ref utils/createCameraDataJSON.m:7-12)
            "IntrinsicMatrix": k.tolist(),
            # Friendly duplicates kept for older readers.
            "FocalLength": [float(k[0, 0]), float(k[1, 1])],
            "PrincipalPoint": [float(k[0, 2]), float(k[1, 2])],
            "RadialDistortion": np.asarray(cam.radial).tolist(),
            "TangentialDistortion": np.asarray(cam.tangential).tolist(),
            "ImageSize": [],
        }

    data = {
        "LeftCamera": cam_dict(stereo.cam1),
        "RightCamera": cam_dict(stereo.cam2),
        "PoseCamera2": np.asarray(stereo.t_c2_c1).tolist(),
    }
    for key, val in (
        ("PatternExtrinsics1", stereo.t_c1_patterns),
        ("PatternExtrinsics2", stereo.t_c2_patterns),
        ("WorldPoints", stereo.calib_points),
    ):
        if val is not None:
            data[key] = np.asarray(val).tolist()
    with open(path, "w") as f:
        json.dump(data, f, indent=2)


def grid_points_to_json(gp: GridPoints) -> str:
    """Serialize detected grid points to the reference's JSON contract.

    Matches ref utils/util_cylinder.py:1674-1727 make_json: points sorted by
    (id_x, id_y), ids rendered as "(i,j)" strings, center_point included.
    """
    xy = np.asarray(gp.xy)
    idx = np.asarray(gp.idx)
    valid = np.asarray(gp.valid)
    entries = [
        (int(idx[i, 0]), int(idx[i, 1]), float(xy[i, 0]), float(xy[i, 1]))
        for i in range(xy.shape[0])
        if valid[i]
    ]
    entries.sort(key=lambda e: (e[0], e[1]))
    center = np.asarray(gp.center)
    return json.dumps(
        {
            "center_point": [float(center[0]), float(center[1])],
            "points": [
                {"id": f"({ix},{iy})", "x": x, "y": y} for ix, iy, x, y in entries
            ],
        }
    )


_ID_RE = re.compile(r"\(?\[?\s*(-?\d+)\s*,\s*(-?\d+)\s*\]?\)?")


def grid_points_from_json(
    text: str, capacity: int = 512, dtype=jnp.float32
) -> GridPoints:
    """Parse the grid-point JSON into a dense GridPoints.

    Accepts both "(i,j)" and "[i,j]" id spellings (the reference emits both
    across versions; ref utils/pointsStruct2mat.m:20-30 strips brackets).
    """
    data = json.loads(text)
    pts = data.get("points", [])
    n = min(len(pts), capacity)
    xy = np.zeros((capacity, 2), np.float32)
    idx = np.zeros((capacity, 2), np.int32)
    valid = np.zeros((capacity,), bool)
    for i, p in enumerate(pts[:n]):
        m = _ID_RE.match(str(p["id"]))
        if not m:
            continue
        idx[i] = (int(m.group(1)), int(m.group(2)))
        xy[i] = (float(p["x"]), float(p["y"]))
        valid[i] = True
    center = np.asarray(data.get("center_point", [0.0, 0.0]), np.float32)
    return GridPoints(
        xy=jnp.asarray(xy, dtype),
        idx=jnp.asarray(idx),
        valid=jnp.asarray(valid),
        center=jnp.asarray(center, dtype),
    )
