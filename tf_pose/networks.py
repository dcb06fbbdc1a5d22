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
    """Infer the model name from a reference-style artifact path.

    Raises ``ValueError`` when no registry model name appears in the
    path: silently substituting a default would run the WRONG network
    on a typo'd artifact path, which is worse than the reference's
    loud failure on a bad graph path (``tf.gfile.GFile`` raises,
    estimator.py:~310)."""
    p = path.replace("\\", "/")
    for name in _MODEL_NAMES:
        if f"/{name}/" in p or p.endswith(name):
            return name
    base = os.path.basename(os.path.dirname(p))
    if base in _MODEL_NAMES:
        return base
    raise ValueError(
        f"cannot infer a model name from artifact path {path!r}; "
        f"known models: {', '.join(_MODEL_NAMES)}")
