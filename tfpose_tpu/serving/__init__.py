from tfpose_tpu.serving.messages import (
    BodyPartElm,
    Person,
    Persons,
    humans_to_msg,
)
from tfpose_tpu.serving.batcher import DynamicBatcher
from tfpose_tpu.serving.service import PoseClient, PoseService

__all__ = ["BodyPartElm", "Person", "Persons", "humans_to_msg",
           "PoseClient", "PoseService", "DynamicBatcher"]
