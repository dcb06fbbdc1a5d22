"""Reference ``tf_pose/runner.py`` surface."""

from tfpose_tpu.runner import (  # noqa: F401
    Estimator,
    get_estimator,
    infer,
)
