from cylinder_pose_estimation_tpu.geometry import (
    correspond,
    curvature,
    cylinder,
    kinematics,
    plane,
    registration,
    transforms,
    triangulate,
)
