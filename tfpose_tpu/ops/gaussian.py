"""Gaussian heatmap smoothing (reference ``tf_pose/tensblur/smoother.py``).

The reference builds a 25x25 kernel from differences of the normal CDF
(nsig=3) as an outer product of a 1-D vector with itself, normalised by
the 2-D sum, and applies it with a depthwise conv. Because the kernel is
exactly separable we run two 1-D depthwise convolutions instead — 25x
fewer MACs — with identical numerics up to fp32 rounding.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from scipy import stats


@functools.lru_cache(maxsize=16)
def gauss_kernel_1d(kernlen: int = 25, nsig: float = 3.0) -> np.ndarray:
    """Normalised 1-D Gaussian weights (reference construction)."""
    interval = (2.0 * nsig + 1.0) / kernlen
    x = np.linspace(-nsig - interval / 2.0, nsig + interval / 2.0,
                    kernlen + 1)
    kern1d = np.diff(stats.norm.cdf(x))
    # 2-D kernel = outer(k, k) / sum(outer(k, k)) => 1-D factor = k / sum(k)
    return (kern1d / kern1d.sum()).astype(np.float32)


def smooth(x: jnp.ndarray, kernlen: int = 25, nsig: float = 3.0,
           dtype=jnp.float32) -> jnp.ndarray:
    """Separable depthwise Gaussian blur, SAME zero padding.

    Accepts (H, W, C) or (N, H, W, C).
    """
    squeeze = x.ndim == 3
    if squeeze:
        x = x[None]
    n, h, w, c = x.shape
    k1 = jnp.asarray(gauss_kernel_1d(kernlen, nsig), dtype=dtype)
    x = x.astype(dtype)
    pad = kernlen // 2
    # vertical pass: kernel (kernlen, 1, 1, C) depthwise
    hp = jax.lax.Precision.HIGHEST  # keep decode numerics true fp32 on TPU
    kv = jnp.tile(k1[:, None, None, None], (1, 1, 1, c))
    x = jax.lax.conv_general_dilated(
        x, kv, window_strides=(1, 1), padding=((pad, pad), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c,
        precision=hp)
    # horizontal pass: kernel (1, kernlen, 1, C)
    kh = jnp.tile(k1[None, :, None, None], (1, 1, 1, c))
    x = jax.lax.conv_general_dilated(
        x, kh, window_strides=(1, 1), padding=((0, 0), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c,
        precision=hp)
    return x[0] if squeeze else x
