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
from jax import lax

Dtype = Any

# Quantization mode threaded through every backbone:
#   "none"  — fp32/bf16 convs (nn.Conv), the default path
#   "int8"  — int8 x int8 -> int32 convs with calibrated per-tensor
#             input scales + per-output-channel weight scales (PTQ);
#             the reference ran quantized-graph experiments
#             (tf_pose/estimator.py ``_quantize_img`` +
#             ``openpose_quantize`` registry entry [LC]); on TPU the
#             win is structural: the traffic-bound thin forward
#             (etcs/architecture.md round-3 roofline) halves its
#             activation bytes vs bf16
#   "calib" — fp32 convs that record per-conv input absmax into the
#             mutable 'quant' collection (post-training calibration)
QuantMode = str


class QuantConv(nn.Module):
    """Drop-in replacement for ``nn.Conv`` on the int8 inference path.

    Parameter names and shapes ('kernel', 'bias') match ``nn.Conv``
    exactly, so fp32 checkpoints load unchanged; weight scales are
    derived from the fp32 kernel at apply time (weights are ~1 MB —
    the requantize folds into the conv epilogue, activations are what
    matter). The input scale is a calibrated absmax in the 'quant'
    variable collection (see ``models/quantize.py``).
    """

    features: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    feature_group_count: int = 1
    use_bias: bool = False
    calibrate: bool = False

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1] // self.feature_group_count
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (*self.kernel_size, in_ch, self.features), jnp.float32)
        bias = (self.param("bias", nn.initializers.zeros,
                           (self.features,), jnp.float32)
                if self.use_bias else None)
        stat = self.variable("quant", "in_absmax",
                             lambda: jnp.zeros((), jnp.float32))
        dn = lax.conv_dimension_numbers(
            x.shape, kernel.shape, ("NHWC", "HWIO", "NHWC"))

        x = x.astype(jnp.float32)
        if self.calibrate:
            if self.is_mutable_collection("quant"):
                stat.value = jnp.maximum(stat.value, jnp.max(jnp.abs(x)))
            y = lax.conv_general_dilated(
                x, kernel, self.strides, "SAME", dimension_numbers=dn,
                feature_group_count=self.feature_group_count)
        else:
            s_in = jnp.maximum(stat.value, 1e-6) / 127.0
            xq = jnp.clip(jnp.round(x / s_in), -127, 127).astype(jnp.int8)
            w_amax = jnp.maximum(
                jnp.max(jnp.abs(kernel), axis=(0, 1, 2)), 1e-8)
            s_w = w_amax / 127.0
            wq = jnp.clip(jnp.round(kernel / s_w), -127, 127
                          ).astype(jnp.int8)
            y = lax.conv_general_dilated(
                xq, wq, self.strides, "SAME", dimension_numbers=dn,
                feature_group_count=self.feature_group_count,
                preferred_element_type=jnp.int32)
            y = y.astype(jnp.float32) * (s_in * s_w)
        if bias is not None:
            y = y + bias
        return y


def conv_layer(quant: QuantMode, features, kernel, strides, *, name,
               use_bias: bool, feature_group_count: int = 1,
               dtype=jnp.float32):
    """nn.Conv or QuantConv with identical parameter trees."""
    if quant == "none":
        return nn.Conv(features, kernel, strides, padding="SAME",
                       use_bias=use_bias,
                       feature_group_count=feature_group_count,
                       dtype=dtype, name=name)
    return QuantConv(features, kernel, strides,
                     feature_group_count=feature_group_count,
                     use_bias=use_bias, calibrate=(quant == "calib"),
                     name=name)


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
    quant: QuantMode = "none"

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = conv_layer(self.quant, self.features, self.kernel,
                       self.strides, use_bias=False, dtype=self.dtype,
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
    quant: QuantMode = "none"

    @nn.compact
    def __call__(self, x, train: bool = False):
        del train
        x = conv_layer(self.quant, self.features, self.kernel,
                       self.strides, use_bias=True, dtype=self.dtype,
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
    quant: QuantMode = "none"

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_ch = x.shape[-1]
        x = conv_layer(self.quant, in_ch, self.kernel, self.strides,
                       feature_group_count=in_ch, use_bias=False,
                       dtype=self.dtype, name="depthwise")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.997,
                         epsilon=1e-3, dtype=self.dtype, name="dw_bn")(x)
        x = nn.relu(x)
        x = conv_layer(self.quant, self.features, (1, 1), (1, 1),
                       use_bias=False, dtype=self.dtype,
                       name="pointwise")(x)
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
    quant: QuantMode = "none"

    @nn.compact
    def __call__(self, x, train: bool = False):
        outs = []
        for li, out_ch in ((1, self.out_l1), (2, self.out_l2)):
            h = x
            for i in (1, 2, 3):
                h = SeparableConv(self.mid, (3, 3), dtype=self.dtype,
                                  quant=self.quant,
                                  name=f"L{li}_{i}")(h, train)
            h = SeparableConv(self.mid2, (1, 1), dtype=self.dtype,
                              quant=self.quant, name=f"L{li}_4")(h, train)
            h = SeparableConv(out_ch, (1, 1), relu=False, dtype=self.dtype,
                              quant=self.quant, name=f"L{li}_5")(h, train)
            outs.append(h)
        return outs[0], outs[1]  # (paf, heat)
