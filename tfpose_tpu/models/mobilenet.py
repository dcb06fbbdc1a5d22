"""MobileNet v1 pose networks (full-width and "thin").

TPU-native flax rebuild of the reference graph builders
(``tf_pose/network_mobilenet.py`` / ``network_mobilenet_thin.py``):
a depthwise-separable backbone with width multiplier ``conv_width``
(Conv2d_0 stride 2, then 11 separable convs, strides 2 at Conv2d_2/4 —
stride 8 overall), a pyramid feature concat (2x-pooled Conv2d_3 +
Conv2d_7 + Conv2d_11), and 6 all-separable two-branch CPM refinement
stages at width ``conv_width2``. ``mobilenet_thin`` uses
conv_width=0.75 / conv_width2=0.50; ``mobilenet`` 1.0/1.0.
Output ``concat_stage7`` = concat(heat 19, paf 38), stride 8.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from tfpose_tpu.models.layers import (
    ConvBN,
    CPMStage,
    SeparableConv,
    max_pool,
)

_MIN_DEPTH = 8


class MobilenetNetwork(nn.Module):
    """MobileNet-v1-style two-branch pose network."""

    conv_width: float = 0.75
    conv_width2: float = 0.50
    dtype: Any = jnp.float32
    num_stages: int = 6
    quant: str = "none"

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dtype
        q = self.quant
        x = x.astype(d)
        depth = lambda ch: max(int(ch * self.conv_width), _MIN_DEPTH)
        depth2 = lambda ch: max(int(ch * self.conv_width2), _MIN_DEPTH)

        # backbone (name, channels, stride)
        x = ConvBN(depth(32), (3, 3), (2, 2), dtype=d, quant=q,
                   name="Conv2d_0")(x, train)
        taps = {}
        spec = [(64, 1), (128, 2), (128, 1), (256, 2), (256, 1),
                (512, 1), (512, 1), (512, 1), (512, 1), (512, 1), (512, 1)]
        for i, (ch, s) in enumerate(spec, start=1):
            x = SeparableConv(depth(ch), (3, 3), (s, s), dtype=d, quant=q,
                              name=f"Conv2d_{i}")(x, train)
            taps[f"Conv2d_{i}"] = x

        feat = jnp.concatenate(
            [max_pool(taps["Conv2d_3"], 2, 2), taps["Conv2d_7"],
             taps["Conv2d_11"]], axis=-1)

        paf = heat = None
        stages = []
        h = feat
        for s in range(1, self.num_stages + 1):
            if s > 1:
                h = jnp.concatenate([paf, heat, feat], axis=-1)
            paf, heat = CPMStage(38, 19, depth2(128), depth2(512), dtype=d,
                                 quant=q, name=f"MConv_Stage{s}")(h, train)
            stages.append((paf, heat))

        out = jnp.concatenate([heat, paf], axis=-1)
        return {"concat_stage7": out, "stages": stages}
