"""Fused inference forward for the MobileNet v1/thin pose networks.

Reimplements ``MobilenetNetwork.__call__`` (models/mobilenet.py) for
inference on TPU, consuming the SAME flax variables pytree but running
every stride-1 separable block through the fused channels-first Pallas
kernel (``ops/pallas/sepconv.py``) with BNs folded to affine — one HBM
round trip per block instead of four-six. The whole backbone runs in
(N, C, H, W) between two transposes; the stem conv and the two
stride-2 blocks stay on XLA. Training and CPU use the plain flax
module.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from tfpose_tpu.ops.pallas.sepconv import (
    fold_bn,
    fused_separable_conv_chw,
)

_BACKBONE_SPEC = [(64, 1), (128, 2), (128, 1), (256, 2), (256, 1),
                  (512, 1), (512, 1), (512, 1), (512, 1), (512, 1),
                  (512, 1)]


def _affine(p_bn, s_bn):
    return fold_bn(p_bn["scale"], p_bn["bias"], s_bn["mean"], s_bn["var"])


def _sep_fused(x, p, s, relu_out=True, interpret=False):
    ds, db = _affine(p["dw_bn"], s["dw_bn"])
    ps, pb = _affine(p["pw_bn"], s["pw_bn"])
    return fused_separable_conv_chw(
        x, p["depthwise"]["kernel"], ds, db, p["pointwise"]["kernel"],
        ps, pb, relu_out=relu_out, interpret=interpret)


def _sep_xla_chw(x, p, s, stride=1, relu_out=True):
    """Unfused fallback with identical math, channels-first
    (stride-2 blocks)."""
    cin = x.shape[1]
    ds, db = _affine(p["dw_bn"], s["dw_bn"])
    ps, pb = _affine(p["pw_bn"], s["pw_bn"])
    y = jax.lax.conv_general_dilated(
        x.astype(jnp.float32),
        p["depthwise"]["kernel"].astype(jnp.float32),
        (stride, stride), "SAME",
        dimension_numbers=("NCHW", "HWIO", "NCHW"),
        feature_group_count=cin)
    y = jnp.maximum(y * ds[None, :, None, None]
                    + db[None, :, None, None], 0.0)
    y = jax.lax.conv_general_dilated(
        y, p["pointwise"]["kernel"].astype(jnp.float32), (1, 1), "SAME",
        dimension_numbers=("NCHW", "HWIO", "NCHW"))
    y = y * ps[None, :, None, None] + pb[None, :, None, None]
    if relu_out:
        y = jnp.maximum(y, 0.0)
    return y.astype(x.dtype)


def _max_pool_chw(x, window=2, stride=2):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 1, window, window),
        (1, 1, stride, stride), "SAME")


def mobilenet_fused_forward(variables: Dict[str, Any], x: jnp.ndarray,
                            num_stages: int = 6,
                            interpret: bool = False) -> Dict[str, Any]:
    """x: (N, H, W, 3) normalized float (NHWC, like the flax module).
    Returns the same dict as ``MobilenetNetwork.apply``."""
    p = variables["params"]
    s = variables["batch_stats"]
    # activations run bf16 (whole planes must stay VMEM-friendly); the
    # kernel accumulates fp32. Interpret mode (CPU tests) keeps the
    # caller dtype for exactness vs the flax reference.
    if not interpret:
        x = x.astype(jnp.bfloat16)

    # stem: conv + BN + relu (XLA, NHWC), then switch to channels-first
    cp, cs = p["Conv2d_0"], s["Conv2d_0"]
    sc, bi = _affine(cp["bn"], cs["bn"])
    y = jax.lax.conv_general_dilated(
        x.astype(jnp.float32), cp["conv"]["kernel"].astype(jnp.float32),
        (2, 2), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = jnp.maximum(y * sc + bi, 0.0).astype(x.dtype)
    y = jnp.transpose(y, (0, 3, 1, 2))  # -> (N, C, H, W)

    taps = {}
    for i, (_, stride) in enumerate(_BACKBONE_SPEC, start=1):
        name = f"Conv2d_{i}"
        cin = y.shape[1]
        # The Pallas depthwise kernel pays off only on big-spatial,
        # low-channel layers: in the (C, H, W) layout a 46x54 plane
        # pads its 54 lanes to 128 (2.4x waste), and deep layers
        # (C>=384) explode VMEM. Narrow-deep layers are matmul-shaped
        # and XLA already handles them well.
        if stride == 1 and cin <= 128 and y.shape[2] >= 92:
            y = _sep_fused(y, p[name], s[name], interpret=interpret)
        else:
            y = _sep_xla_chw(y, p[name], s[name], stride=stride)
        taps[name] = y

    feat = jnp.concatenate(
        [_max_pool_chw(taps["Conv2d_3"]), taps["Conv2d_7"],
         taps["Conv2d_11"]], axis=1)

    paf = heat = None
    stages = []
    h = feat
    for st in range(1, num_stages + 1):
        if st > 1:
            h = jnp.concatenate([paf, heat, feat], axis=1)
        sp = p[f"MConv_Stage{st}"]
        ss = s[f"MConv_Stage{st}"]
        outs = []
        for li in (1, 2):
            g = h
            for i in (1, 2, 3, 4):
                g = _sep_xla_chw(g, sp[f"L{li}_{i}"], ss[f"L{li}_{i}"])
            g = _sep_xla_chw(g, sp[f"L{li}_5"], ss[f"L{li}_5"],
                             relu_out=False)
            outs.append(g)
        paf, heat = outs
        stages.append((jnp.transpose(paf, (0, 2, 3, 1)),
                       jnp.transpose(heat, (0, 2, 3, 1))))

    out = jnp.concatenate([heat, paf], axis=1)
    out = jnp.transpose(out, (0, 2, 3, 1))  # back to NHWC
    return {"concat_stage7": out, "stages": stages}
