"""Checkpoint save/load for the TPU-native models.

The reference's deployment format is a frozen TF1 ``graph_opt.pb``
(vars folded to consts); ours is a flax pytree serialised with
msgpack (+ orbax for training checkpoints, see train/). The
GraphDef -> pytree converter lives in ``convert/graphdef.py``.
"""

from __future__ import annotations

import os
from typing import Any, Dict

import flax.serialization
import jax
import jax.numpy as jnp


def save_params(path: str, variables: Dict[str, Any]) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    data = flax.serialization.to_bytes(
        jax.tree.map(lambda x: jnp.asarray(x), variables))
    with open(path, "wb") as f:
        f.write(data)


def load_params(path: str, template: Dict[str, Any]) -> Dict[str, Any]:
    """Load variables saved by :func:`save_params`; ``template`` is a
    matching pytree (e.g. from ``model.init``) defining the structure."""
    with open(path, "rb") as f:
        data = f.read()
    return flax.serialization.from_bytes(template, data)
