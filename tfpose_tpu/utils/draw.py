"""Skeleton rendering — reference ``TfPoseEstimator.draw_humans``
(``tf_pose/estimator.py:~230``): cv2 circles at each part (CocoColors)
and lines for the 17 rendered pairs."""

from __future__ import annotations

from typing import List

import numpy as np

from tfpose_tpu.core.topology import (
    CocoColors,
    CocoPairsRender,
    NUM_PARTS,
)
from tfpose_tpu.core.types import Human

try:
    import cv2
except ImportError:  # pragma: no cover - cv2 is present in this image
    cv2 = None


def draw_humans(npimg: np.ndarray, humans: List[Human],
                imgcopy: bool = False) -> np.ndarray:
    if cv2 is None:
        raise RuntimeError("cv2 is required for draw_humans")
    if imgcopy:
        npimg = np.copy(npimg)
    image_h, image_w = npimg.shape[:2]
    centers = {}
    for human in humans:
        # draw points
        for i in range(NUM_PARTS):
            if i not in human.body_parts:
                continue
            body_part = human.body_parts[i]
            center = (int(body_part.x * image_w + 0.5),
                      int(body_part.y * image_h + 0.5))
            centers[i] = center
            cv2.circle(npimg, center, 3, CocoColors[i], thickness=3,
                       lineType=8, shift=0)
        # draw lines
        for pair_order, pair in enumerate(CocoPairsRender):
            if pair[0] not in human.body_parts \
                    or pair[1] not in human.body_parts:
                continue
            cv2.line(npimg, centers[pair[0]], centers[pair[1]],
                     CocoColors[pair_order], 3)
    return npimg
