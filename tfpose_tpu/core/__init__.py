from tfpose_tpu.core.config import DecodeParams, EstimatorConfig
from tfpose_tpu.core.topology import (
    NUM_HEATMAP_CH,
    NUM_OUT_CH,
    NUM_PAF_CH,
    NUM_PAIRS,
    NUM_PARTS,
    CocoColors,
    CocoPairs,
    CocoPairsNetwork,
    CocoPairsRender,
    CocoPart,
    MPIIPart,
)
from tfpose_tpu.core.types import BodyPart, Human, PoseArrays

__all__ = [
    "DecodeParams", "EstimatorConfig", "NUM_HEATMAP_CH", "NUM_OUT_CH",
    "NUM_PAF_CH", "NUM_PAIRS", "NUM_PARTS", "CocoColors", "CocoPairs",
    "CocoPairsNetwork", "CocoPairsRender", "CocoPart", "MPIIPart",
    "BodyPart", "Human", "PoseArrays",
]
