"""Image IO helpers — reference ``tf_pose/common.py``
(``read_imgfile``, ``get_sample_images``)."""

from __future__ import annotations

import os
from typing import List, Optional

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None


def read_imgfile(path: str, width: Optional[int] = None,
                 height: Optional[int] = None) -> Optional[np.ndarray]:
    """Read an image (BGR uint8), optionally resizing to (width, height)."""
    if cv2 is None:
        raise RuntimeError("cv2 is required for read_imgfile")
    val_image = cv2.imread(path, cv2.IMREAD_COLOR)
    if val_image is None:
        return None
    if width is not None and height is not None and width > 0 and height > 0:
        val_image = cv2.resize(val_image, (width, height))
    return val_image


def get_sample_images(w: int, h: int,
                      image_dir: Optional[str] = None) -> List[np.ndarray]:
    """Load the sample images directory (reference images/ test photos)."""
    base = image_dir or os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))), "images")
    out = []
    if not os.path.isdir(base):
        return out
    for name in sorted(os.listdir(base)):
        if not name.lower().endswith((".jpg", ".jpeg", ".png")):
            continue
        img = read_imgfile(os.path.join(base, name), w, h)
        if img is not None:
            out.append(img)
    return out
