from perception_tpu.parallel import mesh, icp_dist  # noqa: F401
