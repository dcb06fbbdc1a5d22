"""Reference ``tf_pose/networks.py`` surface."""

from __future__ import annotations

import os

from tfpose_tpu.models import (  # noqa: F401
    get_checkpoint_path,
    get_network,
    model_wh,
)

_MODEL_NAMES = ("cmu", "mobilenet_thin", "mobilenet_v2_large",
                "mobilenet_v2_small", "mobilenet")


def get_graph_path(model_name: str) -> str:
    """Reference semantics returned models/graph/<name>/graph_opt.pb;
    here it resolves to the converted JAX checkpoint path (which the
    shim TfPoseEstimator accepts). A real graph_opt.pb path also works
    with the shim (it is converted on first use)."""
    if model_name not in _MODEL_NAMES:
        raise ValueError(f"unknown model {model_name!r}")
    return get_checkpoint_path(model_name)


def model_name_from_path(path: str) -> str:
    """Infer the model name from a reference-style artifact path."""
    p = path.replace("\\", "/")
    for name in _MODEL_NAMES:
        if f"/{name}/" in p or p.endswith(name):
            return name
    base = os.path.basename(os.path.dirname(p))
    return base if base in _MODEL_NAMES else "mobilenet_thin"
