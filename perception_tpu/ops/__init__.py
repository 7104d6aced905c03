from perception_tpu.ops import points, nn, ransac  # noqa: F401
