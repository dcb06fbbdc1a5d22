"""Fused separable-conv block Pallas kernel (stride 1).

A MobileNet separable block in the reference layer DSL
(``network_base.separable_conv``) is depthwise kxk -> BN -> ReLU ->
pointwise 1x1 -> BN -> (ReLU). XLA executes this as several HBM-bound
kernels; at this model family's sizes a whole feature plane is a few
MB, so the ENTIRE block fits in VMEM. This kernel reads the input
plane once, computes the depthwise conv as unrolled shifted-slice FMAs
(VPU, fp32 accumulation in channel chunks to bound VMEM), folds both
BNs into scale/bias, runs the pointwise matmul on the MXU in row
chunks, and writes the output plane once — HBM traffic drops to the
theoretical minimum (in + out + weights).

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
_VMEM_LIMIT = 96 * 1024 * 1024


def _c_chunk(h: int, w: int, cin: int) -> int:
    """Depthwise fp32-accumulator channel chunk: cap the accumulator at
    ~8 MB while minimising unroll count."""
    by_mem = max(16, (8_000_000 // (h * w * 4)) // 8 * 8)
    return min(cin, by_mem)


def _r_chunk(w: int, cout: int) -> int:
    """Pointwise matmul row chunk: cap the fp32 product at ~6 MB."""
    return max(8, 6_000_000 // (w * cout * 4))


def _kernel(x_ref, dwk_ref, dws_ref, dwb_ref, pwk_ref, pws_ref,
            pwb_ref, out_ref, dw_scratch, *, h: int, w: int, kh: int,
            kw: int, relu_out: bool):
    """x_ref: (H+kh-1, W+kw-1, Cin); dwk: (kh*kw, Cin);
    dws/dwb: (1, Cin); pwk: (Cin, Cout); pws/pwb: (1, Cout);
    out_ref: (H, W, Cout); dw_scratch: (H, W, Cin) input-dtype."""
    cin = x_ref.shape[-1]
    cout = out_ref.shape[-1]

    # depthwise, channel-chunked fp32 accumulation
    cch = _c_chunk(h, w, cin)
    for c0 in range(0, cin, cch):
        c1 = min(c0 + cch, cin)
        acc = jnp.zeros((h, w, c1 - c0), jnp.float32)
        for dy in range(kh):
            for dx in range(kw):
                tap = dwk_ref[dy * kw + dx, c0:c1].astype(jnp.float32)
                acc = acc + x_ref[dy:dy + h, dx:dx + w, c0:c1] \
                    .astype(jnp.float32) * tap[None, None, :]
        acc = acc * dws_ref[0, c0:c1].astype(jnp.float32)[None, None, :] \
            + dwb_ref[0, c0:c1].astype(jnp.float32)[None, None, :]
        dw_scratch[:, :, c0:c1] = jnp.maximum(acc, 0.0).astype(
            dw_scratch.dtype)

    # pointwise matmul, row-chunked
    pwk = pwk_ref[...].astype(jnp.float32)
    pws = pws_ref[0, :].astype(jnp.float32)
    pwb = pwb_ref[0, :].astype(jnp.float32)
    rch = _r_chunk(w, cout)
    for r0 in range(0, h, rch):
        r1 = min(r0 + rch, h)
        rows = dw_scratch[r0:r1, :, :].astype(jnp.float32)
        flat = rows.reshape((r1 - r0) * w, cin)
        out = jnp.dot(flat, pwk, preferred_element_type=jnp.float32)
        out = out * pws[None, :] + pwb[None, :]
        if relu_out:
            out = jnp.maximum(out, 0.0)
        out_ref[r0:r1, :, :] = out.reshape(r1 - r0, w, cout).astype(
            out_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("relu_out", "interpret"))
def fused_separable_conv(x: jnp.ndarray, dw_kernel: jnp.ndarray,
                         dw_scale: jnp.ndarray, dw_bias: jnp.ndarray,
                         pw_kernel: jnp.ndarray, pw_scale: jnp.ndarray,
                         pw_bias: jnp.ndarray,
                         relu_out: bool = True,
                         interpret: bool = False) -> jnp.ndarray:
    """Fused sep-conv block, stride 1, SAME padding.

    x: (N, H, W, Cin); dw_kernel: (kh, kw, 1, Cin) grouped-conv HWIO
    (flax layout); pw_kernel: (1, 1, Cin, Cout) or (Cin, Cout);
    scales/biases: (C,) folded BN affine. Returns (N, H, W, Cout).
    """
    n, h, w, cin = x.shape
    kh, kw = int(dw_kernel.shape[0]), int(dw_kernel.shape[1])
    if pw_kernel.ndim == 4:
        pw_kernel = pw_kernel.reshape(pw_kernel.shape[-2],
                                      pw_kernel.shape[-1])
    cout = pw_kernel.shape[-1]
    ph, pw_ = kh // 2, kw // 2

    xp = jnp.pad(x, ((0, 0), (ph, ph), (pw_, pw_), (0, 0)))
    dwk = dw_kernel.reshape(kh * kw, cin)

    call = pl.pallas_call(
        functools.partial(_kernel, h=h, w=w, kh=kh, kw=kw,
                          relu_out=relu_out),
        out_shape=jax.ShapeDtypeStruct((h, w, cout), x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 7,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((h, w, cin), x.dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )

    def one(img):
        return call(img, dwk,
                    dw_scale.reshape(1, cin), dw_bias.reshape(1, cin),
                    pw_kernel,
                    pw_scale.reshape(1, cout), pw_bias.reshape(1, cout))

    if n == 1:
        return one(xp[0])[None]
    return jax.vmap(one)(xp)


def fold_bn(scale, bias, mean, var, eps: float = 1e-3
            ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """BatchNorm -> affine: y = x * s + b with s = gamma/sqrt(var+eps),
    b = beta - mean * s (matches flax BatchNorm inference)."""
    s = scale / jnp.sqrt(var + eps)
    return s, bias - mean * s
