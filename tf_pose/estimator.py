"""Reference ``tf_pose/estimator.py`` surface.

``TfPoseEstimator(graph_path, target_size, tf_config, trt_bool)``
accepts the reference constructor shape: ``graph_path`` may be a model
name, a converted ``params.msgpack`` path, or a frozen
``graph_opt.pb`` (converted to a pytree on first use);
``tf_config``/``trt_bool`` are accepted and ignored (no TF session /
TensorRT here).
"""

from __future__ import annotations

import logging
import os
from typing import Optional, Tuple

from tfpose_tpu.core.types import BodyPart, Human  # noqa: F401
from tfpose_tpu.estimator import PoseEstimator  # noqa: F401
from tfpose_tpu.estimator import TfPoseEstimator as _Base

logger = logging.getLogger("TfPoseEstimator")


class TfPoseEstimator(_Base):
    def __init__(self, graph_path: str = "mobilenet_thin",
                 target_size: Tuple[int, int] = (320, 240),
                 tf_config=None, trt_bool: bool = False,
                 allow_random_init: bool = False, **kwargs):
        del tf_config, trt_bool  # reference args without a TPU meaning
        model, params_path = _resolve(graph_path, target_size,
                                      allow_random_init)
        super().__init__(model=model, target_size=target_size,
                         params_path=params_path, **kwargs)


def _resolve(graph_path: str, target_size: Tuple[int, int],
             allow_random_init: bool = False,
             ) -> Tuple[str, Optional[str]]:
    from tf_pose.networks import model_name_from_path

    if not os.path.exists(graph_path):
        if os.sep not in graph_path:
            return graph_path, None  # a model name
        # A reference-style artifact path that doesn't exist. The
        # reference fails loudly here (tf.gfile.GFile raises,
        # estimator.py:~310) — so do we, unless the caller explicitly
        # opts into random init (this sandbox ships no reference
        # weights; tests use allow_random_init=True).
        if not allow_random_init:
            raise FileNotFoundError(
                f"model artifact {graph_path!r} does not exist; pass "
                f"allow_random_init=True to run the inferred model "
                f"with random weights instead")
        logger.warning("artifact %s not found; resolving model name "
                       "and running with random init", graph_path)
        return model_name_from_path(graph_path), None
    if graph_path.endswith(".pb"):
        model = model_name_from_path(graph_path)
        out = graph_path[:-3] + ".msgpack"
        if not os.path.exists(out):
            from tfpose_tpu.convert.graphdef import convert_pb_file
            logger.info("converting %s -> %s", graph_path, out)
            convert_pb_file(graph_path, model, out,
                            input_size=target_size)
        return model, out
    return model_name_from_path(graph_path), graph_path
