"""Device-side preprocessing: resize / pad / normalize inside the jitted
program (BASELINE.json: "device-side batched preprocessing (resize, pad,
normalize) for image and video streams").

The reference resizes with cv2 on the host and feeds raw float images
(``tf_pose/estimator.py:_get_scaled_img``); here the uint8 frame is
shipped to HBM once and everything else happens on-device.
"""

from __future__ import annotations

import jax.numpy as jnp

from tfpose_tpu.ops.resize import resize_bilinear


def normalize(img: jnp.ndarray) -> jnp.ndarray:
    """uint8 RGB/BGR (..., H, W, 3) -> float32 in [-0.5, 0.5].

    Matches the reference training preprocessing (image / 256 - 0.5,
    ``tf_pose/pose_augment.py pose_to_img``); all backbones here are
    trained/converted against this convention.
    """
    return img.astype(jnp.float32) / 256.0 - 0.5


def prepare(img: jnp.ndarray, target_h: int, target_w: int) -> jnp.ndarray:
    """uint8 (..., H, W, 3) -> normalized float (..., target_h, target_w, 3)
    via on-device bilinear resize."""
    x = normalize(img)
    if x.shape[-3] != target_h or x.shape[-2] != target_w:
        x = resize_bilinear(x, target_h, target_w)
    return x
