from perception_tpu.models.slam import odometry, backend, system  # noqa: F401
