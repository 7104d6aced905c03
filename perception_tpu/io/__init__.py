from perception_tpu.io import pcd, templates  # noqa: F401
