from perception_tpu.models import (  # noqa: F401
    bbox_filter,
    color_detect,
    cuboid,
    face,
    hand,
    objects,
    pose,
    surface_frame,
    tracking,
    train,
    viz,
)
from perception_tpu.models import slam  # noqa: F401
