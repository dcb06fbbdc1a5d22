"""One-shot convenience API — reference ``tf_pose/runner.py``:
``infer(image, model, resize, resize_out_ratio)`` plus estimator
factory helpers."""

from __future__ import annotations

import logging
from typing import List, Union

import numpy as np

from tfpose_tpu.core.types import Human
from tfpose_tpu.estimator import TfPoseEstimator
from tfpose_tpu.models import model_wh
from tfpose_tpu.utils.imload import read_imgfile

logger = logging.getLogger("tfpose_tpu.runner")

_estimators = {}


def get_estimator(model: str = "mobilenet_thin",
                  resize: str = "0x0") -> TfPoseEstimator:
    """Cached estimator factory (reference get_estimator)."""
    w, h = model_wh(resize)
    if w == 0 or h == 0:
        w, h = 432, 368
    key = (model, w, h)
    if key not in _estimators:
        _estimators[key] = TfPoseEstimator(model, target_size=(w, h))
    return _estimators[key]


def infer(image: Union[str, np.ndarray], model: str = "mobilenet_thin",
          resize: str = "0x0",
          resize_out_ratio: float = 4.0) -> List[Human]:
    """Estimate poses on one image (path or array) — reference
    ``tf_pose.runner.infer``."""
    if isinstance(image, str):
        w, h = model_wh(resize)
        image = read_imgfile(image, None, None)
    if image is None:
        raise Exception("Image can not be read.")
    e = get_estimator(model, resize)
    humans = e.inference(image, resize_to_default=True,
                         upsample_size=resize_out_ratio)
    return humans


Estimator = TfPoseEstimator
