from cylinder_pose_estimation_tpu.parallel import mesh, sharding
