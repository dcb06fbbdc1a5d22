"""Peak extraction: max-pool NMS + fixed-K top-k per part channel.

Replaces the reference's in-graph ``tf.nn.pool`` MAX + ``tf.where``
(``tf_pose/estimator.py:~330``) and the C++ decoder's dynamic row-major
peak scan (``tf_pose/pafprocess/pafprocess.cpp``, step 1) with a
static-shape formulation: the peaks plane is reduced to the top
``max_peaks`` candidates per part, each with (x, y, score, valid).

``jax.lax.top_k`` breaks ties by lower flat index, which equals the
reference's row-major scan preference, so for distinct scores the kept
peak set is identical to the oracle whenever a part has <= max_peaks
peaks above threshold.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class Peaks(NamedTuple):
    """Fixed-shape peak set; all arrays are (num_parts, K)."""

    x: jnp.ndarray       # int32 column
    y: jnp.ndarray       # int32 row
    score: jnp.ndarray   # float32 (smoothed heatmap value)
    valid: jnp.ndarray   # bool


def nms(x: jnp.ndarray, window: int = 3) -> jnp.ndarray:
    """Keep local maxima of (..., H, W, C), zero elsewhere (SAME pad)."""
    pad = window // 2
    pooled = jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        window_dimensions=(1,) * (x.ndim - 3) + (window, window, 1),
        window_strides=(1,) * x.ndim,
        padding=((0, 0),) * (x.ndim - 3) + ((pad, pad), (pad, pad), (0, 0)))
    return jnp.where(x >= pooled, x, jnp.zeros_like(x))


def top_peaks(peaks_map: jnp.ndarray, max_peaks: int,
              thresh: float, num_parts: int = 18) -> Peaks:
    """Extract top-K peaks per part from an NMS'd (H, W, 19) plane."""
    h, w, _ = peaks_map.shape
    planes = peaks_map[:, :, :num_parts]                  # (H, W, P)
    flat = planes.reshape(h * w, num_parts).T             # (P, H*W)
    scores, idx = jax.lax.top_k(flat, max_peaks)          # (P, K)
    yy = (idx // w).astype(jnp.int32)
    xx = (idx % w).astype(jnp.int32)
    valid = scores > thresh
    return Peaks(x=xx, y=yy, score=scores.astype(jnp.float32), valid=valid)
