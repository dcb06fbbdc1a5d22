"""Fused separable-conv block Pallas kernel (stride 1, channels-first).

A MobileNet separable block in the reference layer DSL
(``network_base.separable_conv``) is depthwise kxk -> BN -> ReLU ->
pointwise 1x1 -> BN -> (ReLU). XLA executes this as several HBM-bound
kernels; at this model family's sizes whole feature planes fit in
VMEM, so this kernel reads the input once and writes the output once.

Layout is channels-first (C, H, W): W rides the 128-lane dimension
(well-utilised at any channel count — the NHWC variant wasted >5x at
C=24), the depthwise conv is 9 broadcast FMAs over (C, H, W), both BNs
fold into (C,1,1) affines, and the pointwise conv is ONE MXU matmul
(Cout, Cin) @ (Cin, H*W). The fused forward (models/fused.py) keeps
the whole backbone in CHW between two transposes.

Inference-only (BNs folded); training and the two stride-2 backbone
layers keep the unfused flax/XLA path.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# v5e cores have large VMEM; the 16 MB scoped default is conservative.
_VMEM_LIMIT = 100 * 1024 * 1024


def _dw_kernel(x_ref, dwk_ref, dws_ref, dwb_ref, out_ref, *, h: int,
               w: int, kh: int, kw: int):
    """Depthwise conv + folded BN + ReLU, channels-first.
    x_ref: (Cin, H+kh-1, W+kw-1); dwk: (Cin, kh*kw, 1);
    dws/dwb: (Cin, 1, 1); out_ref: (Cin, H, W).

    All per-channel factors arrive pre-broadcast along W as
    (Cin, taps, W) / (Cin, 1, W): Mosaic supports broadcasting a
    (Cin, 1, W) value across sublanes (H) but not across sublanes and
    lanes at once, and a 1-D (lanes=C) to 3-D relayout is unsupported.
    The pointwise matmul (which contracts C) cannot be fused here for
    the same reason; it runs as an XLA NCHW conv on the MXU right
    after (XLA is already optimal for that — it is the depthwise that
    XLA does poorly)."""
    cin = x_ref.shape[0]
    acc = jnp.zeros((cin, h, w), jnp.float32)
    for dy in range(kh):
        for dx in range(kw):
            t = dy * kw + dx
            tap = dwk_ref[:, t:t + 1, :].astype(jnp.float32)
            acc = acc + x_ref[:, dy:dy + h, dx:dx + w].astype(
                jnp.float32) * tap
    acc = acc * dws_ref[...].astype(jnp.float32) \
        + dwb_ref[...].astype(jnp.float32)
    out_ref[...] = jnp.maximum(acc, 0.0).astype(out_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("relu_out", "interpret"))
def fused_separable_conv_chw(x: jnp.ndarray, dw_kernel: jnp.ndarray,
                             dw_scale: jnp.ndarray,
                             dw_bias: jnp.ndarray,
                             pw_kernel: jnp.ndarray,
                             pw_scale: jnp.ndarray,
                             pw_bias: jnp.ndarray,
                             relu_out: bool = True,
                             interpret: bool = False) -> jnp.ndarray:
    """Fused sep-conv block, stride 1, SAME padding, channels-first.

    x: (N, Cin, H, W); dw_kernel: (kh, kw, 1, Cin) grouped-conv HWIO
    (flax layout); pw_kernel: (1, 1, Cin, Cout) HWIO or (Cin, Cout);
    scales/biases: (C,) folded BN affine. Returns (N, Cout, H, W).
    """
    n, cin, h, w = x.shape
    kh, kw = int(dw_kernel.shape[0]), int(dw_kernel.shape[1])
    if pw_kernel.ndim == 4:
        pw_kernel = pw_kernel.reshape(pw_kernel.shape[-2],
                                      pw_kernel.shape[-1])
    cout = pw_kernel.shape[-1]
    ph, pw_ = kh // 2, kw // 2

    xp = jnp.pad(x, ((0, 0), (0, 0), (ph, ph), (pw_, pw_)))
    # (kh, kw, 1, Cin) -> (Cin, kh*kw, W): C leads, W pre-broadcast
    dwk = jnp.broadcast_to(
        jnp.transpose(dw_kernel.reshape(kh * kw, cin))[:, :, None],
        (cin, kh * kw, w))

    call = pl.pallas_call(
        functools.partial(_dw_kernel, h=h, w=w, kh=kh, kw=kw),
        out_shape=jax.ShapeDtypeStruct((cin, h, w), x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )

    dws = jnp.broadcast_to(dw_scale.reshape(cin, 1, 1), (cin, 1, w))
    dwb = jnp.broadcast_to(dw_bias.reshape(cin, 1, 1), (cin, 1, w))

    def one(img):
        return call(img, dwk, dws, dwb)

    y = one(xp[0])[None] if n == 1 else jax.vmap(one)(xp)

    # pointwise 1x1 + BN (+ReLU) as an XLA NCHW conv (pure MXU matmul)
    out = jax.lax.conv_general_dilated(
        y.astype(jnp.float32),
        pw_kernel.reshape(1, 1, cin, cout).astype(jnp.float32),
        (1, 1), "SAME", dimension_numbers=("NCHW", "HWIO", "NCHW"))
    out = out * pw_scale.astype(jnp.float32)[None, :, None, None] \
        + pw_bias.astype(jnp.float32)[None, :, None, None]
    if relu_out:
        out = jnp.maximum(out, 0.0)
    return out.astype(x.dtype)


def fold_bn(scale, bias, mean, var, eps: float = 1e-3
            ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """BatchNorm -> affine: y = x * s + b with s = gamma/sqrt(var+eps),
    b = beta - mean * s (matches flax BatchNorm inference)."""
    s = scale / jnp.sqrt(var + eps)
    return s, bias - mean * s
