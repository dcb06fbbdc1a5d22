"""Resize ops with exact TF1 semantics, implemented as matmuls.

The reference post-graph upsamples heatmaps/PAFs with TF1
``tf.image.resize_area(align_corners=False)`` (``tf_pose/estimator.py``,
see SURVEY.md §2.1/§7). Area resize is separable and linear, so for the
static shapes of a jitted program we precompute 1-D weight matrices at
trace time and apply them as two dense matmuls — this runs on the MXU
instead of a gather-based resize, and XLA fuses the surrounding
elementwise work into it.

Bilinear (half-pixel, TF2/jax.image-compatible) weights are also
provided for the preprocessing path.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=256)
def _area_weights_np(in_size: int, out_size: int) -> np.ndarray:
    """(out, in) float32 weights for TF1 resize_area, align_corners=False."""
    scale = in_size / out_size
    w = np.zeros((out_size, in_size), dtype=np.float64)
    for i in range(out_size):
        lo, hi = i * scale, (i + 1) * scale
        j0, j1 = int(np.floor(lo)), int(np.ceil(hi))
        for j in range(j0, min(j1, in_size)):
            overlap = min(hi, j + 1) - max(lo, j)
            if overlap > 0:
                w[i, j] = overlap
        w[i] /= scale
    return w.astype(np.float32)


@functools.lru_cache(maxsize=256)
def _bilinear_weights_np(in_size: int, out_size: int) -> np.ndarray:
    """(out, in) float32 weights for half-pixel bilinear resize."""
    w = np.zeros((out_size, in_size), dtype=np.float64)
    if out_size == 1:
        w[0, :] = 0.0
        w[0, min(in_size - 1, 0)] = 1.0
        return w.astype(np.float32)
    scale = in_size / out_size
    for i in range(out_size):
        src = (i + 0.5) * scale - 0.5
        j0 = int(np.floor(src))
        frac = src - j0
        j0c = min(max(j0, 0), in_size - 1)
        j1c = min(max(j0 + 1, 0), in_size - 1)
        w[i, j0c] += 1.0 - frac
        w[i, j1c] += frac
    return w.astype(np.float32)


def _apply_separable(x: jnp.ndarray, wh: np.ndarray, ww: np.ndarray,
                     dtype=jnp.float32) -> jnp.ndarray:
    """Apply (out_h,in_h) and (out_w,in_w) weights to (..., H, W, C)."""
    import jax

    wh_j = jnp.asarray(wh, dtype=dtype)
    ww_j = jnp.asarray(ww, dtype=dtype)
    x = x.astype(dtype)
    # HIGHEST precision: decode-path numerics must stay true fp32 on TPU
    # (default matmul precision would round operands to bf16 on the MXU).
    hp = jax.lax.Precision.HIGHEST
    # rows: (..., H, W, C) -> (..., out_h, W, C)
    x = jnp.einsum("hH,...HWc->...hWc", wh_j, x, precision=hp)
    # cols: (..., out_h, W, C) -> (..., out_h, out_w, C)
    x = jnp.einsum("wW,...hWc->...hwc", ww_j, x, precision=hp)
    return x


def resize_area(x: jnp.ndarray, out_h: int, out_w: int,
                dtype=jnp.float32) -> jnp.ndarray:
    """TF1 resize_area on (..., H, W, C) with static output size.

    Fast path: for integer upscale factors TF1 resize_area is exactly
    nearest-neighbour replication (each output cell lies inside one
    input cell), so a repeat beats the weight matmuls — this is the
    common case (upsample_size 2/4/8 on stride-8 maps).
    """
    *_, h, w, _ = x.shape
    if out_h % h == 0 and out_w % w == 0 and (out_h > h or out_w > w):
        x = x.astype(dtype)
        x = jnp.repeat(x, out_h // h, axis=-3)
        return jnp.repeat(x, out_w // w, axis=-2)
    return _apply_separable(x, _area_weights_np(h, out_h),
                            _area_weights_np(w, out_w), dtype)


def resize_bilinear(x: jnp.ndarray, out_h: int, out_w: int,
                    dtype=jnp.float32) -> jnp.ndarray:
    """Half-pixel bilinear resize on (..., H, W, C) with static size."""
    *_, h, w, _ = x.shape
    return _apply_separable(x, _bilinear_weights_np(h, out_h),
                            _bilinear_weights_np(w, out_w), dtype)
