from perception_tpu.utils import checkpoint, metrics, profiler  # noqa: F401
