from perception_tpu.models import cuboid, objects, surface_frame  # noqa: F401
