from cylinder_pose_estimation_tpu.ops import lm, linalg, polyfit
