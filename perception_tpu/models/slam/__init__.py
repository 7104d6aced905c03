from perception_tpu.models.slam import odometry  # noqa: F401
