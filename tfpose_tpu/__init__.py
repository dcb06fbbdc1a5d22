"""tfpose_tpu — TPU-native multi-person 2D pose estimation framework.

A from-scratch JAX/XLA/Pallas rebuild with the capabilities of the
reference ``tf-pose-estimation`` (OpenPose-style part-affinity-field
pose estimation): CMU VGG-19 and MobileNet(-thin/v2) two-branch
backbones emitting 19 heatmap + 38 PAF channels, a fused on-device
decode path (upsample -> Gaussian smooth -> NMS peaks -> PAF line
integrals -> greedy limb assembly), a ``TfPoseEstimator``-compatible
public API, training, and COCO keypoint evaluation.
"""

__version__ = "0.1.0"

from tfpose_tpu.core import BodyPart, Human  # noqa: F401


def infer(image, model="mobilenet_thin", resize="0x0", resize_out_ratio=4.0):
    """One-shot convenience API (reference ``tf_pose.runner.infer``)."""
    from tfpose_tpu.runner import infer as _infer
    return _infer(image, model=model, resize=resize,
                  resize_out_ratio=resize_out_ratio)
