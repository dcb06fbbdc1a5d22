"""Frozen TF1 ``graph_opt.pb`` (GraphDef) -> flax pytree converter.

The reference deploys frozen graphs (vars folded to consts,
``tf_pose/estimator.py:~310`` reads them with GraphDef.ParseFromString).
This module extracts every Const tensor from such a graph and maps it
onto the matching flax parameter tree of our backbones.

Because the reference mount was empty (SURVEY.md §0), the converter is
written against GraphDef structure generically and verified by
round-tripping graphs produced by our own exporter
(:func:`flax_to_graphdef`), which emits reference-style TF1 names. The
per-backbone name tables may need adjustment against real pb files
when they become available.

Layout conventions handled:
  * conv kernels: TF HWIO == flax HWIO (no transpose needed);
  * depthwise kernels: TF (H, W, C, 1 multiplier) -> flax grouped-conv
    HWIO (H, W, 1, C);
  * folded BatchNorm consts (gamma/beta/moving_mean/moving_variance)
    -> flax BatchNorm {scale, bias} params + {mean, var} batch_stats.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Optional

import numpy as np


# ---------------------------------------------------------------------------
# GraphDef reading (TF optional at runtime)
# ---------------------------------------------------------------------------

def load_graphdef(path: str):
    """Parse a frozen .pb file into a GraphDef proto."""
    from tensorflow.core.framework import graph_pb2

    gd = graph_pb2.GraphDef()
    with open(path, "rb") as f:
        gd.ParseFromString(f.read())
    return gd


def extract_consts(graphdef) -> Dict[str, np.ndarray]:
    """All Const node tensors, keyed by node name."""
    from tensorflow.python.framework import tensor_util

    out = {}
    for node in graphdef.node:
        if node.op != "Const":
            continue
        try:
            out[node.name] = tensor_util.MakeNdarray(node.attr["value"].tensor)
        except Exception:  # non-tensor consts (shapes etc.)
            continue
    return out


# ---------------------------------------------------------------------------
# name mapping
# ---------------------------------------------------------------------------

def _flatten(tree: Any, prefix=()) -> Dict[tuple, np.ndarray]:
    flat = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            flat.update(_flatten(v, prefix + (k,)))
    else:
        flat[prefix] = tree
    return flat


def _unflatten(flat: Dict[tuple, Any]) -> Dict[str, Any]:
    tree: Dict[str, Any] = {}
    for path, v in flat.items():
        node = tree
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = v
    return tree


def tf1_name_for(path: tuple, collection: str, scope: str = "") -> str:
    """Map a flax variable path to the reference-style TF1 const name.

    Examples (collection 'params'):
      ('MConv_Stage1', 'L1_1', 'depthwise', 'kernel')
        -> 'MConv_Stage1_L1_1_depthwise/depthwise_weights'
      ('MConv_Stage1', 'L1_1', 'dw_bn', 'scale')
        -> 'MConv_Stage1_L1_1_depthwise/BatchNorm/gamma'
      ('conv4_3_CPM', 'conv', 'kernel') -> 'conv4_3_CPM/weights'
    """
    *mods, leaf = path
    mods = list(mods)

    bn_leaf = {"scale": "gamma", "bias": "beta",
               "mean": "moving_mean", "var": "moving_variance"}

    name: Optional[str] = None
    if mods and mods[-1] in ("depthwise", "pointwise"):
        base = "_".join(mods[:-1]) + "_" + mods[-1]
        sub = "depthwise_weights" if mods[-1] == "depthwise" else "weights"
        name = f"{base}/{sub}"
    elif mods and mods[-1] in ("dw_bn", "pw_bn"):
        side = "depthwise" if mods[-1] == "dw_bn" else "pointwise"
        base = "_".join(mods[:-1]) + "_" + side
        name = f"{base}/BatchNorm/{bn_leaf[leaf]}"
    elif mods and mods[-1] == "bn":
        base = "_".join(mods[:-1])
        name = f"{base}/BatchNorm/{bn_leaf[leaf]}"
    elif mods and mods[-1] == "conv":
        base = "_".join(mods[:-1])
        name = f"{base}/weights" if leaf == "kernel" else f"{base}/biases"
    elif mods and mods[-1].endswith("_bn"):
        base = "_".join(mods[:-1] + [mods[-1][:-3]])
        name = f"{base}/BatchNorm/{bn_leaf[leaf]}"
    else:
        base = "_".join(mods)
        sub = {"kernel": "weights", "bias": "biases"}.get(
            leaf, bn_leaf.get(leaf, leaf))
        name = f"{base}/{sub}"
    return f"{scope}/{name}" if scope else name


def _to_flax_layout(arr: np.ndarray, path: tuple) -> np.ndarray:
    """TF const -> flax param layout."""
    if path[-1] == "kernel" and "depthwise" in path:
        # TF depthwise (H, W, C, mult=1) -> grouped conv HWIO (H, W, 1, C)
        if arr.ndim == 4 and arr.shape[3] == 1:
            return np.transpose(arr, (0, 1, 3, 2))
    return arr


def _from_flax_layout(arr: np.ndarray, path: tuple) -> np.ndarray:
    if path[-1] == "kernel" and "depthwise" in path:
        if arr.ndim == 4 and arr.shape[2] == 1:
            return np.transpose(arr, (0, 1, 3, 2))
    return arr


def graphdef_to_variables(graphdef, template: Dict[str, Any],
                          scope: str = "") -> Dict[str, Any]:
    """Build a flax variables pytree from a frozen GraphDef.

    ``template``: pytree from ``model.init`` defining structure/shapes.
    Raises with a detailed report when names or shapes don't line up.
    """
    consts = extract_consts(graphdef)
    out_flat: Dict[tuple, np.ndarray] = {}
    missing, mismatched = [], []
    for coll in ("params", "batch_stats"):
        if coll not in template:
            continue
        for path, value in _flatten(template[coll]).items():
            tf_name = tf1_name_for(path, coll, scope)
            arr = consts.get(tf_name)
            if arr is None:
                # frozen graphs often read via Identity nodes
                arr = consts.get(tf_name + "/read")
            if arr is None:
                missing.append(tf_name)
                continue
            arr = _to_flax_layout(np.asarray(arr, np.float32), path)
            if arr.shape != value.shape:
                mismatched.append((tf_name, arr.shape, value.shape))
                continue
            out_flat[(coll,) + path] = arr
    if missing or mismatched:
        raise ValueError(
            "GraphDef -> flax conversion failed.\n"
            f"missing consts ({len(missing)}): {missing[:10]}...\n"
            f"shape mismatches: {mismatched[:10]}")
    return _unflatten(out_flat)


# ---------------------------------------------------------------------------
# exporter (for round-trip tests and interop)
# ---------------------------------------------------------------------------

def variables_to_graphdef(variables: Dict[str, Any], scope: str = ""):
    """Emit a GraphDef of Const nodes with reference-style TF1 names —
    the inverse of :func:`graphdef_to_variables` (used for round-trip
    tests while no real pb files are available, and to export our
    trained weights for TF1 consumers)."""
    from tensorflow.core.framework import graph_pb2
    from tensorflow.python.framework import tensor_util

    gd = graph_pb2.GraphDef()
    for coll in ("params", "batch_stats"):
        if coll not in variables:
            continue
        for path, value in _flatten(variables[coll]).items():
            node = gd.node.add()
            node.name = tf1_name_for(path, coll, scope)
            node.op = "Const"
            arr = _from_flax_layout(np.asarray(value, np.float32), path)
            node.attr["dtype"].type = 1  # DT_FLOAT
            node.attr["value"].tensor.CopyFrom(
                tensor_util.make_tensor_proto(arr))
    return gd


def convert_pb_file(pb_path: str, model_name: str, out_path: str,
                    input_size=(432, 368)) -> None:
    """CLI-facing: frozen pb -> msgpack checkpoint for ``model_name``."""
    import jax
    import jax.numpy as jnp

    from tfpose_tpu.convert.checkpoint import save_params
    from tfpose_tpu.models import get_network

    net = get_network(model_name)
    w, h = input_size
    template = net.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, h, w, 3), jnp.float32), train=False)
    gd = load_graphdef(pb_path)
    variables = graphdef_to_variables(gd, template, scope="Openpose")
    save_params(out_path, variables)
