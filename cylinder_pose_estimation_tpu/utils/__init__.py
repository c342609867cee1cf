from cylinder_pose_estimation_tpu.utils import io, synthetic
