"""Weight quantization utilities.

The reference shipped a quantized CMU graph (``openpose_quantize``
[SURVEY.md §2.2, LC]) produced by TF1 graph-transform quantization.
TPU-native equivalents:

  * ``quantize_params`` / ``dequantize_params``: per-channel symmetric
    int8 weight-only quantization of a flax params pytree (4x smaller
    checkpoints; dequantised on load, so the compute path is
    unchanged);
  * ``cast_params``: bf16 parameter casting for HBM-light serving.

Conv kernels quantize per output channel (last axis); vectors (biases,
BN stats) stay fp32 — they are tiny and precision-critical.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _quantize_leaf(x: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """(int8 values, fp32 per-out-channel scales)."""
    absmax = np.abs(x).reshape(-1, x.shape[-1]).max(axis=0)
    scale = np.maximum(absmax, 1e-12) / 127.0
    q = np.clip(np.round(x / scale), -127, 127).astype(np.int8)
    return q, scale.astype(np.float32)


def quantize_params(params: Dict[str, Any]) -> Dict[str, Any]:
    """params pytree -> {'q': int8 pytree-ish, 's': scales, 'fp': rest}."""
    q_tree, s_tree, fp_tree = {}, {}, {}

    def rec(src, q, s, fp):
        for k, v in src.items():
            if isinstance(v, dict):
                q[k], s[k], fp[k] = {}, {}, {}
                rec(v, q[k], s[k], fp[k])
            else:
                arr = np.asarray(v)
                if arr.ndim >= 2:  # kernels
                    qv, sv = _quantize_leaf(arr)
                    q[k], s[k] = qv, sv
                else:
                    fp[k] = arr.astype(np.float32)

    rec(params, q_tree, s_tree, fp_tree)
    return {"q": q_tree, "s": s_tree, "fp": fp_tree}


def dequantize_params(packed: Dict[str, Any],
                      dtype=jnp.float32) -> Dict[str, Any]:
    out: Dict[str, Any] = {}

    def rec(q, s, fp, dst):
        keys = set(q) | set(fp)
        for k in keys:
            if k in q and isinstance(q[k], dict):
                dst[k] = {}
                rec(q[k], s[k], fp.get(k, {}), dst[k])
            elif k in q:
                dst[k] = (jnp.asarray(q[k], dtype)
                          * jnp.asarray(s[k], dtype))
            else:
                dst[k] = jnp.asarray(fp[k], dtype)

    rec(packed["q"], packed["s"], packed["fp"], out)
    return out


def cast_params(params: Dict[str, Any], dtype=jnp.bfloat16):
    """Cast all kernel leaves to ``dtype`` (serving memory saver)."""
    return jax.tree.map(
        lambda x: x.astype(dtype) if np.ndim(x) >= 2 else x, params)


def quantization_error(params: Dict[str, Any]) -> float:
    """Max relative L2 error introduced by int8 round trip (sanity)."""
    packed = quantize_params(params)
    restored = dequantize_params(packed)
    errs = []

    def rec(a, b):
        for k, v in a.items():
            if isinstance(v, dict):
                rec(v, b[k])
            elif np.ndim(v) >= 2:
                va = np.asarray(v, np.float32)
                vb = np.asarray(b[k], np.float32)
                denom = np.linalg.norm(va) + 1e-12
                errs.append(np.linalg.norm(va - vb) / denom)

    rec(params, restored)
    return float(max(errs)) if errs else 0.0
