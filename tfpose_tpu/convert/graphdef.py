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


_BN_LEAF = {"scale": "gamma", "bias": "beta",
            "mean": "moving_mean", "var": "moving_variance"}


def tf1_name_for(path: tuple, collection: str, scope: str = "") -> str:
    """Map a flax variable path to the reference-style TF1 const name
    (flat / network_base style; ``tf_pose/network_base.py:≈60`` builds
    variable scopes like ``Conv2d_1_depthwise``).

    Examples (collection 'params'):
      ('MConv_Stage1', 'L1_1', 'depthwise', 'kernel')
        -> 'MConv_Stage1_L1_1_depthwise/depthwise_weights'
      ('MConv_Stage1', 'L1_1', 'dw_bn', 'scale')
        -> 'MConv_Stage1_L1_1_depthwise/BatchNorm/gamma'
      ('conv4_3_CPM', 'conv', 'kernel') -> 'conv4_3_CPM/weights'
    """
    *mods, leaf = path
    mods = list(mods)

    bn_leaf = _BN_LEAF

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


def tf1_slim_name_for(path: tuple, collection: str) -> Optional[str]:
    """Slim-style nested name for MobileNet-v2 backbone variables, as
    real ``tensorflow/models`` slim checkpoints/frozen graphs emit them
    (reference vendored pkg ``tf_pose/mobilenet/mobilenet_v2.py``):

      ('Conv', 'kernel')                       -> 'MobilenetV2/Conv/weights'
      ('Conv_bn', 'scale')                     -> 'MobilenetV2/Conv/BatchNorm/gamma'
      ('expanded_conv_0', 'depthwise', 'kernel')
        -> 'MobilenetV2/expanded_conv/depthwise/depthwise_weights'
          (slim leaves the FIRST block unindexed)
      ('expanded_conv_3', 'expand', 'kernel')
        -> 'MobilenetV2/expanded_conv_3/expand/weights'
      ('expanded_conv_3', 'dw_bn', 'mean')
        -> 'MobilenetV2/expanded_conv_3/depthwise/BatchNorm/moving_mean'

    Returns None for paths that are not v2-backbone-shaped (CPM stages
    etc. use the flat style).
    """
    *mods, leaf = path
    if not mods:
        return None
    head = mods[0]
    if not (head == "Conv" or head == "Conv_bn"
            or head.startswith("expanded_conv")):
        return None

    def fix_block(n: str) -> str:
        # slim: first expanded_conv has no _0 suffix
        return "expanded_conv" if n == "expanded_conv_0" else n

    parts = ["MobilenetV2"]
    if head == "Conv":
        parts.append("Conv")
        rest = mods[1:]
    elif head == "Conv_bn":
        parts.append("Conv")
        rest = ["bn"] + mods[1:]
    else:
        parts.append(fix_block(head))
        rest = mods[1:]

    bn_side = {"dw_bn": "depthwise", "pw_bn": "pointwise",
               "expand_bn": "expand", "project_bn": "project"}
    sub = rest[-1] if rest else None
    if sub in bn_side:
        parts += [bn_side[sub], "BatchNorm", _BN_LEAF[leaf]]
    elif sub == "bn" or (sub and sub.endswith("_bn")):
        if sub != "bn":
            parts.append(sub[:-3])
        parts += ["BatchNorm", _BN_LEAF[leaf]]
    elif leaf in _BN_LEAF and collection == "batch_stats":
        # bare BN module name (e.g. rest == ['bn'] already handled)
        parts += (list(rest) + ["BatchNorm", _BN_LEAF[leaf]])
    else:
        parts += list(rest)
        if leaf == "kernel":
            parts.append("depthwise_weights" if parts[-1] == "depthwise"
                         else "weights")
        elif leaf == "bias":
            parts.append("biases")
        else:
            parts.append(_BN_LEAF.get(leaf, leaf))
    return "/".join(parts)


def tf1_name_candidates(path: tuple, collection: str,
                        scope: str = "") -> list:
    """All plausible const names for a flax path, most-likely first.

    Covers: the flat network_base style, the slim nested v2 style, each
    under the scope prefixes real frozen graphs use ('' | 'Openpose'
    from ``networks.py`` get_network scoping | the given scope), and
    ``<name>/read`` Identity forms (tried by the caller).
    """
    names = []
    slim = tf1_slim_name_for(path, collection)
    if slim is not None:
        names.append(slim)
    flat = tf1_name_for(path, collection)
    names.append(flat)

    prefixes = []
    for p in (scope, "Openpose", ""):
        if p not in prefixes:
            prefixes.append(p)
    out = []
    for n in names:
        for p in prefixes:
            full = f"{p}/{n}" if p else n
            if full not in out:
                out.append(full)
    return out


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


def _lookup(consts: Dict[str, np.ndarray], path: tuple, coll: str,
            scope: str) -> Optional[np.ndarray]:
    for name in tf1_name_candidates(path, coll, scope):
        arr = consts.get(name)
        if arr is None:
            # frozen graphs often read consts via Identity '<n>/read'
            arr = consts.get(name + "/read")
        if arr is not None:
            return arr
    return None


def _folded_bn_value(consts: Dict[str, np.ndarray], path: tuple,
                     coll: str, scope: str, shape) -> Optional[np.ndarray]:
    """Identity BN stand-in for graphs with BatchNorm folded into the
    conv (TF graph-transform ``fold_batch_norms``: conv weights are
    pre-scaled and a ``biases`` const appears; the BN nodes vanish).

    Folded semantics: y = conv(x, W') + b. Our flax module computes
    bn(conv(x, W)) = (conv - mean)/sqrt(var+eps)*scale + bias, so with
    W=W', mean=0, var=1-eps, scale=1, bias=b the outputs match exactly.
    The ``var = 1 - eps`` trick makes sqrt(var+eps) == 1 for any eps.
    """
    *mods, leaf = path
    if leaf not in _BN_LEAF or not mods:
        return None
    bn_mod = mods[-1]
    side = {"dw_bn": "depthwise", "pw_bn": "pointwise"}.get(bn_mod)
    if side is not None:
        conv_path = tuple(mods[:-1]) + (side, "kernel")
    elif bn_mod == "bn":
        conv_path = tuple(mods[:-1]) + ("conv", "kernel")
    elif bn_mod.endswith("_bn"):
        conv_path = tuple(mods[:-1]) + (bn_mod[:-3], "kernel")
    else:
        return None
    # the fold only applies when the conv's kernel IS present but its
    # BatchNorm consts are not — find the conv's biases const
    bias = None
    for name in tf1_name_candidates(conv_path, "params", scope):
        base = name.rsplit("/", 1)[0]
        bias = consts.get(f"{base}/biases")
        if bias is None:
            bias = consts.get(f"{base}/biases/read")
        if bias is not None:
            break
    if bias is None:
        return None
    bias = np.asarray(bias, np.float32).reshape(-1)
    if bias.shape != tuple(shape):
        return None
    if leaf == "bias":
        return bias
    if leaf == "scale":
        return np.ones_like(bias)
    if leaf == "mean":
        return np.zeros_like(bias)
    return np.full_like(bias, 1.0 - 1e-3)  # var; eps=1e-3 in our BNs


def graphdef_to_variables(graphdef, template: Dict[str, Any],
                          scope: str = "") -> Dict[str, Any]:
    """Build a flax variables pytree from a frozen GraphDef.

    ``template``: pytree from ``model.init`` defining structure/shapes.
    Tries every plausible reference naming (flat network_base style,
    slim nested v2 style, scope prefixes, '/read' Identity forms) and
    falls back to identity BN for folded-BatchNorm graphs. Raises with
    a detailed report when names or shapes don't line up.
    """
    consts = extract_consts(graphdef)
    out_flat: Dict[tuple, np.ndarray] = {}
    missing, mismatched = [], []
    for coll in ("params", "batch_stats"):
        if coll not in template:
            continue
        for path, value in _flatten(template[coll]).items():
            arr = _lookup(consts, path, coll, scope)
            if arr is None:
                arr = _folded_bn_value(consts, path, coll, scope,
                                       value.shape)
                if arr is not None:
                    out_flat[(coll,) + path] = arr
                    continue
            if arr is None:
                missing.append(tf1_name_candidates(path, coll, scope)[0])
                continue
            arr = _to_flax_layout(np.asarray(arr, np.float32), path)
            if arr.shape != value.shape:
                mismatched.append((path, arr.shape, value.shape))
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

def variables_to_graphdef(variables: Dict[str, Any], scope: str = "",
                          style: str = "flat", read_nodes: bool = False):
    """Emit a GraphDef of Const nodes with reference-style TF1 names —
    the inverse of :func:`graphdef_to_variables` (used for round-trip
    tests while no real pb files are available, and to export our
    trained weights for TF1 consumers).

    ``style='slim'`` names v2-backbone variables the way real slim
    frozen graphs do (``MobilenetV2/expanded_conv_N/...``, first block
    unindexed); other variables keep the flat style. ``read_nodes``
    additionally emits ``<name>/read`` Identity nodes as real frozen
    graphs contain.
    """
    from tensorflow.core.framework import graph_pb2
    from tensorflow.python.framework import tensor_util

    gd = graph_pb2.GraphDef()
    for coll in ("params", "batch_stats"):
        if coll not in variables:
            continue
        for path, value in _flatten(variables[coll]).items():
            name = None
            if style == "slim":
                name = tf1_slim_name_for(path, coll)
            if name is None:
                name = tf1_name_for(path, coll, scope)
            elif scope:
                name = f"{scope}/{name}"
            node = gd.node.add()
            node.name = name
            node.op = "Const"
            arr = _from_flax_layout(np.asarray(value, np.float32), path)
            node.attr["dtype"].type = 1  # DT_FLOAT
            node.attr["value"].tensor.CopyFrom(
                tensor_util.make_tensor_proto(arr))
            if read_nodes:
                rd = gd.node.add()
                rd.name = name + "/read"
                rd.op = "Identity"
                rd.input.append(name)
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
