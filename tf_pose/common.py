"""Reference ``tf_pose/common.py`` surface."""

from tfpose_tpu.core.topology import (  # noqa: F401
    CocoColors,
    CocoPairs,
    CocoPairsNetwork,
    CocoPairsRender,
    CocoPart,
    MPIIPart,
    MPII_FROM_COCO,
)
from tfpose_tpu.utils.imload import (  # noqa: F401
    get_sample_images,
    read_imgfile,
)
