"""Fused inference forward for the MobileNet v1/thin pose networks.

Reimplements ``MobilenetNetwork.__call__`` (models/mobilenet.py) for
inference on TPU, consuming the SAME flax variables pytree but running
every stride-1 separable block through the fused Pallas kernel
(``ops/pallas/sepconv.py``) with BNs folded to affine — one HBM round
trip per block instead of four-six. The stem conv and the two stride-2
blocks stay on XLA (MXU conv / rare). Training and CPU use the plain
flax module.
"""

from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp

from tfpose_tpu.models.layers import max_pool
from tfpose_tpu.ops.pallas.sepconv import fold_bn, fused_separable_conv

_BACKBONE_SPEC = [(64, 1), (128, 2), (128, 1), (256, 2), (256, 1),
                  (512, 1), (512, 1), (512, 1), (512, 1), (512, 1),
                  (512, 1)]


def _affine(p_bn, s_bn):
    return fold_bn(p_bn["scale"], p_bn["bias"], s_bn["mean"], s_bn["var"])


def _sep_fused(x, p, s, relu_out=True, interpret=False):
    ds, db = _affine(p["dw_bn"], s["dw_bn"])
    ps, pb = _affine(p["pw_bn"], s["pw_bn"])
    return fused_separable_conv(
        x, p["depthwise"]["kernel"], ds, db, p["pointwise"]["kernel"],
        ps, pb, relu_out=relu_out, interpret=interpret)


def _sep_xla(x, p, s, stride=1, relu_out=True):
    """Unfused fallback with identical math (stride-2 blocks, CPU)."""
    cin = x.shape[-1]
    ds, db = _affine(p["dw_bn"], s["dw_bn"])
    ps, pb = _affine(p["pw_bn"], s["pw_bn"])
    dwk = p["depthwise"]["kernel"]
    y = jax.lax.conv_general_dilated(
        x.astype(jnp.float32), dwk.astype(jnp.float32),
        (stride, stride), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=cin)
    y = jnp.maximum(y * ds + db, 0.0)
    pwk = p["pointwise"]["kernel"].astype(jnp.float32)
    y = jax.lax.conv_general_dilated(
        y, pwk, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = y * ps + pb
    if relu_out:
        y = jnp.maximum(y, 0.0)
    return y.astype(x.dtype)


def mobilenet_fused_forward(variables: Dict[str, Any], x: jnp.ndarray,
                            num_stages: int = 6,
                            interpret: bool = False) -> Dict[str, Any]:
    """x: (N, H, W, 3) normalized float. Returns the same dict as
    ``MobilenetNetwork.apply`` (concat_stage7 + stages)."""
    p = variables["params"]
    s = variables["batch_stats"]
    # activations run bf16 (VMEM: whole planes must fit; fp32 planes at
    # the first layers exceed the 16 MB scoped limit). The kernel
    # accumulates fp32 internally; decode re-casts to fp32 downstream.
    # Interpret mode (CPU tests) keeps the caller dtype for exactness.
    if not interpret:
        x = x.astype(jnp.bfloat16)

    # stem: conv + BN + relu (XLA; MXU conv)
    cp, cs = p["Conv2d_0"], s["Conv2d_0"]
    sc, bi = _affine(cp["bn"], cs["bn"])
    y = jax.lax.conv_general_dilated(
        x.astype(jnp.float32), cp["conv"]["kernel"].astype(jnp.float32),
        (2, 2), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = jnp.maximum(y * sc + bi, 0.0).astype(x.dtype)

    taps = {}
    for i, (_, stride) in enumerate(_BACKBONE_SPEC, start=1):
        name = f"Conv2d_{i}"
        if stride == 1:
            y = _sep_fused(y, p[name], s[name], interpret=interpret)
        else:
            y = _sep_xla(y, p[name], s[name], stride=stride)
        taps[name] = y

    feat = jnp.concatenate(
        [max_pool(taps["Conv2d_3"], 2, 2), taps["Conv2d_7"],
         taps["Conv2d_11"]], axis=-1)

    paf = heat = None
    stages = []
    h = feat
    for st in range(1, num_stages + 1):
        if st > 1:
            h = jnp.concatenate([paf, heat, feat], axis=-1)
        sp = p[f"MConv_Stage{st}"]
        ss = s[f"MConv_Stage{st}"]
        outs = []
        for li in (1, 2):
            g = h
            for i in (1, 2, 3, 4):
                g = _sep_fused(g, sp[f"L{li}_{i}"], ss[f"L{li}_{i}"],
                               interpret=interpret)
            g = _sep_fused(g, sp[f"L{li}_5"], ss[f"L{li}_5"],
                           relu_out=False, interpret=interpret)
            outs.append(g)
        paf, heat = outs
        stages.append((paf, heat))

    out = jnp.concatenate([heat, paf], axis=-1)
    return {"concat_stage7": out, "stages": stages}
