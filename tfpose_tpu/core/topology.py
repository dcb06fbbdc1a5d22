"""Skeleton topology tables for the COCO 18-part body model.

TPU-native rebuild of the constant tables in the reference
(``tf_pose/common.py:~1-130`` — ``CocoPart``, ``CocoPairs``,
``CocoPairsNetwork``, ``CocoPairsRender``, ``CocoColors``, ``MPIIPart``)
and the native decoder's pair tables
(``tf_pose/pafprocess/pafprocess.h`` — ``COCOPAIRS``, ``COCOPAIRS_NET``).

Everything here is pure data; the JAX decode path consumes the numpy
arrays at trace time so they become compile-time constants.
"""

from __future__ import annotations

import enum

import numpy as np

NUM_PARTS = 18  # body parts (Background = index 18 is channel-only)
NUM_HEATMAP_CH = 19  # 18 parts + background
NUM_PAF_CH = 38  # 19 limb pairs x (x, y)
NUM_PAIRS = 19
NUM_OUT_CH = NUM_HEATMAP_CH + NUM_PAF_CH  # 57: network emits [heat(19), paf(38)]


class CocoPart(enum.IntEnum):
    """Part indices of the 18-keypoint COCO body model (reference common.py)."""

    Nose = 0
    Neck = 1
    RShoulder = 2
    RElbow = 3
    RWrist = 4
    LShoulder = 5
    LElbow = 6
    LWrist = 7
    RHip = 8
    RKnee = 9
    RAnkle = 10
    LHip = 11
    LKnee = 12
    LAnkle = 13
    REye = 14
    LEye = 15
    REar = 16
    LEar = 17
    Background = 18


# 19 limb pairs (part-index pairs). The last two (ears<->shoulders) are used
# for assembly but not rendered, exactly as in the reference.
CocoPairs = (
    (1, 2), (1, 5), (2, 3), (3, 4), (5, 6), (6, 7), (1, 8), (8, 9), (9, 10),
    (1, 11), (11, 12), (12, 13), (1, 0), (0, 14), (14, 16), (0, 15), (15, 17),
    (2, 16), (5, 17),
)
CocoPairsRender = CocoPairs[:-2]

# PAF channel index pairs (x-channel, y-channel) into the 38-channel PAF
# block, one per limb pair, same order as CocoPairs (reference
# CocoPairsNetwork / pafprocess.h COCOPAIRS_NET).
CocoPairsNetwork = (
    (12, 13), (20, 21), (14, 15), (16, 17), (22, 23), (24, 25), (0, 1),
    (2, 3), (4, 5), (8, 9), (10, 11), (6, 7), (28, 29), (30, 31), (34, 35),
    (32, 33), (36, 37), (18, 19), (26, 27),
)

CocoColors = (
    (255, 0, 0), (255, 85, 0), (255, 170, 0), (255, 255, 0), (170, 255, 0),
    (85, 255, 0), (0, 255, 0), (0, 255, 85), (0, 255, 170), (0, 255, 255),
    (0, 170, 255), (0, 85, 255), (0, 0, 255), (85, 0, 255), (170, 0, 255),
    (255, 0, 255), (255, 0, 170), (255, 0, 85),
)


class MPIIPart(enum.IntEnum):
    """MPII 16-part model (reference common.MPIIPart)."""

    RAnkle = 0
    RKnee = 1
    RHip = 2
    LHip = 3
    LKnee = 4
    LAnkle = 5
    RWrist = 6
    RElbow = 7
    RShoulder = 8
    LShoulder = 9
    LElbow = 10
    LWrist = 11
    Neck = 12
    Head = 13


# (MPII part, COCO part) correspondence used by MPIIPart.from_coco in the
# reference; Head maps from Nose.
MPII_FROM_COCO = (
    (MPIIPart.Head, CocoPart.Nose),
    (MPIIPart.Neck, CocoPart.Neck),
    (MPIIPart.RShoulder, CocoPart.RShoulder),
    (MPIIPart.RElbow, CocoPart.RElbow),
    (MPIIPart.RWrist, CocoPart.RWrist),
    (MPIIPart.LShoulder, CocoPart.LShoulder),
    (MPIIPart.LElbow, CocoPart.LElbow),
    (MPIIPart.LWrist, CocoPart.LWrist),
    (MPIIPart.RHip, CocoPart.RHip),
    (MPIIPart.RKnee, CocoPart.RKnee),
    (MPIIPart.RAnkle, CocoPart.RAnkle),
    (MPIIPart.LHip, CocoPart.LHip),
    (MPIIPart.LKnee, CocoPart.LKnee),
    (MPIIPart.LAnkle, CocoPart.LAnkle),
)

# COCO-17 keypoint order used by the COCO dataset / eval json
# (reference eval.write_coco_json maps the 18-part model back to this).
COCO17_FROM_MODEL18 = (
    CocoPart.Nose, CocoPart.LEye, CocoPart.REye, CocoPart.LEar, CocoPart.REar,
    CocoPart.LShoulder, CocoPart.RShoulder, CocoPart.LElbow, CocoPart.RElbow,
    CocoPart.LWrist, CocoPart.RWrist, CocoPart.LHip, CocoPart.RHip,
    CocoPart.LKnee, CocoPart.RKnee, CocoPart.LAnkle, CocoPart.RAnkle,
)

# Left/right part swap table for horizontal flips (reference
# pose_augment.pose_flip).
FLIP_SWAP = (
    CocoPart.Nose, CocoPart.Neck, CocoPart.LShoulder, CocoPart.LElbow,
    CocoPart.LWrist, CocoPart.RShoulder, CocoPart.RElbow, CocoPart.RWrist,
    CocoPart.LHip, CocoPart.LKnee, CocoPart.LAnkle, CocoPart.RHip,
    CocoPart.RKnee, CocoPart.RAnkle, CocoPart.LEye, CocoPart.REye,
    CocoPart.LEar, CocoPart.REar,
)


def mpii_from_coco(human) -> list:
    """Convert a Human's COCO-18 parts to MPII order — reference
    ``MPIIPart.from_coco``: returns [(MPIIPart, BodyPart)] for the
    parts present."""
    out = []
    for mpii_part, coco_part in MPII_FROM_COCO:
        idx = int(coco_part)
        if idx in human.body_parts:
            out.append((mpii_part, human.body_parts[idx]))
    return out


def pairs_array() -> np.ndarray:
    """(19, 2) int32 array of part-index pairs."""
    return np.asarray(CocoPairs, dtype=np.int32)


def paf_channels_array() -> np.ndarray:
    """(19, 2) int32 array of (x, y) PAF channel indices."""
    return np.asarray(CocoPairsNetwork, dtype=np.int32)


def colors_array() -> np.ndarray:
    return np.asarray(CocoColors, dtype=np.uint8)
