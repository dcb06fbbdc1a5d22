from tfpose_tpu.models.cmu import CmuNetwork
from tfpose_tpu.models.mobilenet import MobilenetNetwork
from tfpose_tpu.models.mobilenet_v2 import MobilenetV2Network
from tfpose_tpu.models.registry import (
    MODEL_NAMES,
    get_checkpoint_path,
    get_network,
    model_wh,
)

__all__ = [
    "CmuNetwork", "MobilenetNetwork", "MobilenetV2Network", "MODEL_NAMES",
    "get_checkpoint_path", "get_network", "model_wh",
]
