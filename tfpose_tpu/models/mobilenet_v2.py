"""MobileNet v2 pose networks (large / small).

TPU-native flax rebuild of the reference graph builder
(``tf_pose/network_mobilenet_v2.py`` with the vendored slim
``tf_pose/mobilenet/mobilenet_v2.py`` V2_DEF): an inverted-residual
backbone, tapped at the stride-8 endpoint (slim ``layer_7``, last of
the 32-channel group) and the stride-16 endpoint (``layer_14``, last
of the 96-channel group); the deeper tap is upsampled 2x and
concatenated, then 6 all-separable two-branch CPM refinement stages.
``mobilenet_v2_large`` uses depth multiplier 1.4, ``..._small`` 0.50
(SURVEY.md §2.2; refine-stage widths are low-confidence reconstruction).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from tfpose_tpu.models.layers import CPMStage, conv_layer, make_divisible
from tfpose_tpu.ops.resize import resize_bilinear

# V2_DEF inverted residual blocks: (expansion, channels, stride)
_V2_BLOCKS = [
    (1, 16, 1),                                # layer_2
    (6, 24, 2), (6, 24, 1),                    # layer_3..4
    (6, 32, 2), (6, 32, 1), (6, 32, 1),        # layer_5..7   (stride 8)
    (6, 64, 2), (6, 64, 1), (6, 64, 1), (6, 64, 1),   # layer_8..11
    (6, 96, 1), (6, 96, 1), (6, 96, 1),        # layer_12..14 (stride 16)
]
_TAP_S8 = 5    # index into _V2_BLOCKS of the stride-8 tap (layer_7)
_TAP_S16 = 12  # stride-16 tap (layer_14)


class InvertedResidual(nn.Module):
    """slim ``expanded_conv``: 1x1 expand + 3x3 depthwise + 1x1 project,
    residual when stride 1 and channels match. ReLU6 activations."""

    features: int
    expansion: int
    stride: int
    dtype: Any = jnp.float32
    quant: str = "none"

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dtype
        q = self.quant
        in_ch = x.shape[-1]
        h = x
        if self.expansion != 1:
            h = conv_layer(q, in_ch * self.expansion, (1, 1), (1, 1),
                           use_bias=False, dtype=d, name="expand")(h)
            h = nn.BatchNorm(use_running_average=not train, momentum=0.997,
                             epsilon=1e-3, dtype=d, name="expand_bn")(h)
            h = nn.relu6(h)
        h = conv_layer(q, h.shape[-1], (3, 3),
                       (self.stride, self.stride),
                       feature_group_count=h.shape[-1],
                       use_bias=False, dtype=d, name="depthwise")(h)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.997,
                         epsilon=1e-3, dtype=d, name="dw_bn")(h)
        h = nn.relu6(h)
        h = conv_layer(q, self.features, (1, 1), (1, 1), use_bias=False,
                       dtype=d, name="project")(h)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.997,
                         epsilon=1e-3, dtype=d, name="project_bn")(h)
        if self.stride == 1 and in_ch == self.features:
            h = h + x
        return h


class MobilenetV2Network(nn.Module):
    """MobileNet-v2 two-branch pose network."""

    conv_width: float = 1.4       # depth multiplier (large); small = 0.50
    refine_width: float = 1.0     # CPM stage width multiplier
    dtype: Any = jnp.float32
    num_stages: int = 6
    quant: str = "none"

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dtype
        q = self.quant
        x = x.astype(d)
        m = self.conv_width

        def dm(ch: int) -> int:
            # slim: multiplier applied with make_divisible, floor 8
            return make_divisible(ch * m, 8)

        h = conv_layer(q, dm(32), (3, 3), (2, 2), use_bias=False,
                       dtype=d, name="Conv")(x)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.997,
                         epsilon=1e-3, dtype=d, name="Conv_bn")(h)
        h = nn.relu6(h)
        tap8 = tap16 = None
        for i, (t, c, s) in enumerate(_V2_BLOCKS):
            h = InvertedResidual(dm(c), t, s, dtype=d, quant=q,
                                 name=f"expanded_conv_{i}")(h, train)
            if i == _TAP_S8:
                tap8 = h
            if i == _TAP_S16:
                tap16 = h

        up = resize_bilinear(tap16.astype(jnp.float32),
                             tap8.shape[1], tap8.shape[2]).astype(d)
        feat = jnp.concatenate([tap8, up], axis=-1)

        depth2 = lambda ch: max(int(ch * self.refine_width), 8)
        paf = heat = None
        stages = []
        g = feat
        for s in range(1, self.num_stages + 1):
            if s > 1:
                g = jnp.concatenate([paf, heat, feat], axis=-1)
            paf, heat = CPMStage(38, 19, depth2(128), depth2(512), dtype=d,
                                 quant=q, name=f"MConv_Stage{s}")(g, train)
            stages.append((paf, heat))

        out = jnp.concatenate([heat, paf], axis=-1)
        return {"concat_stage7": out, "stages": stages}
