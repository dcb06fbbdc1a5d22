"""Small-plane 2-D convolution as an explicit tap-loop of MXU matmuls.

Target: the CMU CPM refinement stages (``tf_pose/network_cmu.py``
``Mconv1..5_stage{n}_L{1,2}`` — fifty 7x7 convs on the 82x46 stride-8
grid; ~65% of the model's FLOPs). The round-3 device profile
(scripts/profile_forward.py) shows XLA runs each of these at ~21% MXU:
the implicit-GEMM conv emitter pays window/halo overhead that dwarfs
the tiny plane.

This kernel exploits that the ENTIRE padded input plane fits VMEM:
one grid program per image loads the plane once and evaluates the conv
as kh*kw shifted matmuls

    acc(M, Cout) += x_flat[off(ky, kx) : off + M, :] @ W[ky, kx]

over a row-major flattened plane. Mosaic alignment rules shape the
layout (learned on-chip):

* the plane is held FP32 so the horizontal shift can be one
  ``pltpu.roll`` per kx — Mosaic has no 16-bit rotate ("Rotate with
  non-32-bit data"); the rolled plane is cast to bf16 once per kx
  (full-plane VPU cast, ~1 us) before the matmuls;
* the padded width Wp is a multiple of 16 so every ``ky*Wp`` slice
  offset is aligned to the bf16 (16, 128) sublane tile.

Row-wrap garbage from the roll only ever lands in the right-padding
output columns (Wp >= W + 2*rx by construction), which the caller
discards. Accumulation is fp32; bias + optional ReLU fuse into the
epilogue.

Inference-only (no custom VJP): the backbones engage it behind
``fast_infer`` (models/layers.py) which only the inference facades
set. Exact vs XLA conv up to bf16 matmul summation order — backbone
tolerance, NOT decode tolerance (decode stays on its own fp32 path).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# qualification limit: fp32 plane + rolled copy + bf16 cast + weights
# + fp32 accumulator + output must fit the ~16 MB VMEM scope
_VMEM_BUDGET = 12 * 1024 * 1024


def _round_up(v: int, m: int) -> int:
    return (v + m - 1) // m * m


def _geometry(h: int, w: int, cin: int, cout: int, kh: int, kw: int):
    cinp = _round_up(cin, 128)
    coutp = _round_up(cout, 128)
    wp = _round_up(w + kw - 1, 16)
    mp = _round_up((h + kh - 1) * wp, 16)
    mo = h * wp
    return cinp, coutp, wp, mp, mo


def can_use_conv_matmul(h: int, w: int, cin: int, cout: int,
                        kh: int, kw: int, strides=(1, 1)) -> bool:
    """Static qualification for :func:`conv_matmul_pallas`."""
    if strides != (1, 1) or kh % 2 != 1 or kw % 2 != 1:
        return False
    if kh * kw < 9:  # 1x1 convs are already pure matmuls under XLA
        return False
    cinp, coutp, wp, mp, mo = _geometry(h, w, cin, cout, kh, kw)
    if coutp > 128:
        return False
    vmem = (
        mp * cinp * 4 * 2        # fp32 plane + one live rolled copy
        + mp * cinp * 2          # bf16 cast of the rolled plane
        + kh * kw * cinp * coutp * 2  # bf16 weights
        + mo * coutp * 4         # fp32 accumulator
        + mo * coutp * 2         # output block
    )
    return vmem <= _VMEM_BUDGET


def _kernel(x_ref, w_ref, b_ref, out_ref, *, kh: int, kw: int,
            wp: int, mo: int, relu: bool, out_dtype):
    x = x_ref[0]                                   # (Mp, Cinp) fp32
    acc = jnp.zeros(out_ref.shape[1:], jnp.float32)  # (Mo, Coutp)
    for kx in range(kw):
        xs = pltpu.roll(x, shift=(-kx) % x.shape[0], axis=0) if kx \
            else x
        xb = xs.astype(jnp.bfloat16)
        for ky in range(kh):
            o = ky * wp                            # 16-aligned
            acc += jnp.dot(xb[o:o + mo, :], w_ref[ky * kw + kx],
                           preferred_element_type=jnp.float32)
    acc += b_ref[...]                              # (1, Coutp) f32
    if relu:
        acc = jnp.maximum(acc, 0.0)
    out_ref[0] = acc.astype(out_dtype)


@functools.partial(jax.jit,
                   static_argnames=("relu", "interpret"))
def conv_matmul_pallas(x: jnp.ndarray, kernel: jnp.ndarray,
                       bias: jnp.ndarray | None, *, relu: bool = True,
                       interpret: bool = False) -> jnp.ndarray:
    """SAME, stride-1 conv of (B, H, W, Cin) by (kh, kw, Cin, Cout).

    Callers must check :func:`can_use_conv_matmul` first. Compute is
    bf16 x bf16 -> fp32 (the MXU's native mode, matching what XLA does
    for a bf16 ``lax.conv``); output dtype follows ``x``.
    """
    b, h, w, cin = x.shape
    kh, kw, _, cout = kernel.shape
    ry, rx = kh // 2, kw // 2
    cinp, coutp, wp, mp, mo = _geometry(h, w, cin, cout, kh, kw)

    xp = jnp.pad(x.astype(jnp.float32),
                 ((0, 0), (ry, ry), (rx, wp - w - rx),
                  (0, cinp - cin)))
    xp = xp.reshape(b, (h + kh - 1) * wp, cinp)
    if mp != xp.shape[1]:
        xp = jnp.pad(xp, ((0, 0), (0, mp - xp.shape[1]), (0, 0)))
    wk = jnp.pad(kernel.astype(jnp.bfloat16),
                 ((0, 0), (0, 0), (0, cinp - cin),
                  (0, coutp - cout))).reshape(kh * kw, cinp, coutp)
    bb = jnp.zeros((coutp,), jnp.float32) if bias is None else \
        jnp.pad(bias.astype(jnp.float32), (0, coutp - cout))

    out = pl.pallas_call(
        functools.partial(_kernel, kh=kh, kw=kw, wp=wp, mo=mo,
                          relu=relu, out_dtype=x.dtype),
        out_shape=jax.ShapeDtypeStruct((b, mo, coutp), x.dtype),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, mp, cinp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kh * kw, cinp, coutp), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, coutp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, mo, coutp), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xp, wk, bb.reshape(1, coutp))
    return out.reshape(b, h, wp, coutp)[:, :, :w, :cout]
