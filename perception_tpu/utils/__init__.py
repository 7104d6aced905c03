from perception_tpu.utils import metrics  # noqa: F401
