"""Reference ``tf_pose.pafprocess`` surface (the SWIG extension)."""

from tfpose_tpu.compat.pafprocess import (  # noqa: F401
    get_num_humans,
    get_part_cid,
    get_part_score,
    get_part_x,
    get_part_y,
    get_score,
    process_paf,
)
