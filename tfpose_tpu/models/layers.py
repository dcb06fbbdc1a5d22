"""Shared flax building blocks for the pose backbones.

TPU-native equivalents of the reference layer DSL
(``tf_pose/network_base.py:~1-300``: ``conv``, ``convb`` (conv+BN+ReLU),
``separable_conv`` (depthwise+BN+pointwise+BN), ``max_pool``,
``upsample``) as flax.linen modules. NHWC layout; ``dtype`` selects the
compute precision (bfloat16 on TPU keeps the MXU fed; params stay
fp32).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

Dtype = Any


def make_divisible(v: float, divisor: int = 8,
                   min_value: Optional[int] = None) -> int:
    """Channel rounding used by the slim MobileNet defs."""
    if min_value is None:
        min_value = divisor
    new_v = max(min_value, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


class ConvBN(nn.Module):
    """conv + BN + (optional) ReLU — reference ``convb``."""

    features: int
    kernel: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    relu: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.features, self.kernel, self.strides,
                    padding="SAME", use_bias=False, dtype=self.dtype,
                    name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.997,
                         epsilon=1e-3, dtype=self.dtype, name="bn")(x)
        if self.relu:
            x = nn.relu(x)
        return x


class Conv(nn.Module):
    """plain conv + bias + (optional) ReLU — reference ``conv``."""

    features: int
    kernel: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    relu: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        del train
        x = nn.Conv(self.features, self.kernel, self.strides,
                    padding="SAME", use_bias=True, dtype=self.dtype,
                    name="conv")(x)
        if self.relu:
            x = nn.relu(x)
        return x


class SeparableConv(nn.Module):
    """depthwise conv + BN + ReLU + pointwise conv + BN + (ReLU) —
    reference ``separable_conv`` (slim separable_convolution2d)."""

    features: int
    kernel: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    relu: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_ch = x.shape[-1]
        x = nn.Conv(in_ch, self.kernel, self.strides, padding="SAME",
                    feature_group_count=in_ch, use_bias=False,
                    dtype=self.dtype, name="depthwise")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.997,
                         epsilon=1e-3, dtype=self.dtype, name="dw_bn")(x)
        x = nn.relu(x)
        x = nn.Conv(self.features, (1, 1), (1, 1), padding="SAME",
                    use_bias=False, dtype=self.dtype, name="pointwise")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.997,
                         epsilon=1e-3, dtype=self.dtype, name="pw_bn")(x)
        if self.relu:
            x = nn.relu(x)
        return x


def max_pool(x, window: int = 2, stride: int = 2):
    return nn.max_pool(x, (window, window), (stride, stride), "SAME")


class CPMStage(nn.Module):
    """One two-branch refinement stage made of separable convs —
    reference MobileNet-style ``MConv_Stage{n}_L{1,2}_{1..5}``
    (3x3 sep x3 at ``mid``, 1x1 sep at ``mid2``, 1x1 sep to ``out``,
    last layer linear)."""

    out_l1: int  # 38 (PAF branch)
    out_l2: int  # 19 (heatmap branch)
    mid: int
    mid2: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        outs = []
        for li, out_ch in ((1, self.out_l1), (2, self.out_l2)):
            h = x
            for i in (1, 2, 3):
                h = SeparableConv(self.mid, (3, 3), dtype=self.dtype,
                                  name=f"L{li}_{i}")(h, train)
            h = SeparableConv(self.mid2, (1, 1), dtype=self.dtype,
                              name=f"L{li}_4")(h, train)
            h = SeparableConv(out_ch, (1, 1), relu=False, dtype=self.dtype,
                              name=f"L{li}_5")(h, train)
            outs.append(h)
        return outs[0], outs[1]  # (paf, heat)
