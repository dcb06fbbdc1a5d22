"""Model registry — reference ``tf_pose/networks.py`` equivalents:
``get_network(name)``, ``model_wh('432x368')``, plus checkpoint path
resolution (the TPU-native analogue of ``get_graph_path``)."""

from __future__ import annotations

import os
from typing import Any, Tuple

import jax.numpy as jnp

from tfpose_tpu.models.cmu import CmuNetwork
from tfpose_tpu.models.mobilenet import MobilenetNetwork
from tfpose_tpu.models.mobilenet_v2 import MobilenetV2Network

MODEL_NAMES = (
    "cmu",
    "mobilenet",
    "mobilenet_thin",
    "mobilenet_v2_large",
    "mobilenet_v2_small",
)

_DEFAULT_MODEL_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "models")


def get_network(name: str, dtype: Any = jnp.float32,
                quant: str = "none"):
    """Instantiate a backbone by reference model name.

    ``quant``: "none" (fp32/bf16), "int8" (calibrated PTQ inference,
    see models/quantize.py) or "calib" (fp32 forward recording per-conv
    input absmax into the mutable 'quant' collection).
    """
    if name in ("cmu", "vgg"):
        return CmuNetwork(dtype=dtype, quant=quant)
    if name == "mobilenet":
        return MobilenetNetwork(conv_width=1.0, conv_width2=1.0,
                                dtype=dtype, quant=quant)
    if name == "mobilenet_thin":
        return MobilenetNetwork(conv_width=0.75, conv_width2=0.50,
                                dtype=dtype, quant=quant)
    if name == "mobilenet_v2_large":
        return MobilenetV2Network(conv_width=1.4, refine_width=1.0,
                                  dtype=dtype, quant=quant)
    if name == "mobilenet_v2_small":
        return MobilenetV2Network(conv_width=0.50, refine_width=0.50,
                                  dtype=dtype, quant=quant)
    raise ValueError(
        f"unknown model {name!r}; known: {', '.join(MODEL_NAMES)}")


def get_checkpoint_path(model_name: str, model_dir: str | None = None) -> str:
    """Path of the converted orbax/msgpack checkpoint for ``model_name``
    (reference ``get_graph_path`` returned models/graph/<name>/graph_opt.pb;
    we store JAX pytrees under models/jax/<name>/)."""
    base = model_dir or os.environ.get("TFPOSE_TPU_MODEL_DIR",
                                       _DEFAULT_MODEL_DIR)
    return os.path.join(base, "jax", model_name, "params.msgpack")


def model_wh(resolution_str: str) -> Tuple[int, int]:
    """Parse '432x368' -> (432, 368); '0x0' means dynamic (reference)."""
    width, height = map(int, resolution_str.split("x"))
    if width % 16 != 0 or height % 16 != 0:
        raise ValueError("width and height should be multiples of 16")
    return width, height
