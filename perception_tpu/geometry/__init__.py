from perception_tpu.geometry import se3, camera  # noqa: F401
