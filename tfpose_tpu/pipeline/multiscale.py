"""Multi-scale / sliding-window inference.

The reference handles inputs larger than the network with the vendored
``adamrehn/slidingwindow`` package: overlapping windows (0.2 overlap)
are inferred one by one and their heatmaps merged with distance-
weighted matrices (``tf_pose/estimator.py:_get_scaled_img``,
``tf_pose/slidingwindow/Merging.py``). SURVEY.md §2.5 calls this the
repo's only spatial parallelism.

TPU-native rebuild: window geometry is static given (image, network)
sizes, so all windows become ONE batched forward (vmap over the window
axis), the merge is a precomputed weighted scatter executed on device,
and the merged 57-channel map is decoded once. No per-window host
round trips.
"""

from __future__ import annotations

import functools
from typing import List, NamedTuple

import jax.numpy as jnp
import numpy as np


class WindowGrid(NamedTuple):
    """Static sliding-window geometry (pixel units, stride-1 space)."""

    origins: np.ndarray   # (n_windows, 2) int (y0, x0)
    win_h: int
    win_w: int
    img_h: int
    img_w: int


def generate_windows(img_h: int, img_w: int, win_h: int, win_w: int,
                     overlap: float = 0.2, stride: int = 8) -> WindowGrid:
    """Cover (img_h, img_w) with windows of (win_h, win_w) at >= the
    given fractional overlap (reference generateForSize semantics).
    Window origins snap to multiples of ``stride`` so the networks'
    stride-8 output grids align exactly when merged."""
    def starts(total: int, win: int) -> List[int]:
        if total <= win:
            return [0]
        step = max(int(win * (1.0 - overlap)) // stride * stride, stride)
        last = (total - win) // stride * stride
        xs = list(range(0, last + 1, step))
        if xs[-1] != last:
            xs.append(last)
        return xs

    if img_h % stride or img_w % stride:
        raise ValueError(
            f"image dims must be multiples of stride {stride}; "
            f"pad first (windowed_forward does this automatically)")
    ys = starts(img_h, win_h)
    xs = starts(img_w, win_w)
    origins = np.asarray([(y, x) for y in ys for x in xs], np.int32)
    return WindowGrid(origins, win_h, win_w, img_h, img_w)


@functools.lru_cache(maxsize=64)
def _merge_weights(grid_key) -> np.ndarray:
    """(n_windows, img_h, img_w) normalised distance weights: each
    window's contribution peaks at its centre (reference distance-
    weighted merge)."""
    origins, win_h, win_w, img_h, img_w = grid_key
    origins = np.asarray(origins)
    n = origins.shape[0]
    w = np.zeros((n, img_h, img_w), np.float32)
    yy, xx = np.mgrid[0:win_h, 0:win_w].astype(np.float32)
    cy, cx = (win_h - 1) / 2.0, (win_w - 1) / 2.0
    # distance-to-centre weight, strictly positive
    dist = np.hypot((yy - cy) / max(cy, 1), (xx - cx) / max(cx, 1))
    win_w_mat = 1.0 / (1.0 + dist)
    for i, (y0, x0) in enumerate(origins):
        w[i, y0:y0 + win_h, x0:x0 + win_w] = win_w_mat
    norm = w.sum(axis=0, keepdims=True)
    return w / np.maximum(norm, 1e-12)


def extract_windows(img: jnp.ndarray, grid: WindowGrid) -> jnp.ndarray:
    """(img_h, img_w, C) -> (n_windows, win_h, win_w, C) via static
    slices (XLA-friendly: unrolled constant-offset slices)."""
    outs = [img[y0:y0 + grid.win_h, x0:x0 + grid.win_w]
            for (y0, x0) in np.asarray(grid.origins)]
    return jnp.stack(outs)


def merge_maps(window_maps: jnp.ndarray, grid: WindowGrid,
               out_scale: float = 1.0) -> jnp.ndarray:
    """(n_windows, wh, ww, C) feature maps (window size scaled by
    ``out_scale`` vs pixel space, e.g. 1/8 for the net output) ->
    merged (img_h*s, img_w*s, C)."""
    s = out_scale
    key = (tuple(map(tuple, np.asarray(grid.origins * s, np.int64))),
           int(grid.win_h * s), int(grid.win_w * s),
           int(grid.img_h * s), int(grid.img_w * s))
    weights = jnp.asarray(_merge_weights(key))  # (n, H, W)
    n, wh, ww, c = window_maps.shape
    ih, iw = int(grid.img_h * s), int(grid.img_w * s)
    origins = np.asarray(grid.origins * s, np.int64)
    merged = jnp.zeros((ih, iw, c), window_maps.dtype)
    for i in range(n):
        y0, x0 = origins[i]
        patch = window_maps[i] * weights[i, y0:y0 + wh, x0:x0 + ww, None]
        merged = merged.at[y0:y0 + wh, x0:x0 + ww, :].add(patch)
    return merged


def windowed_forward(apply_fn, img: jnp.ndarray, win_h: int, win_w: int,
                     overlap: float = 0.2) -> jnp.ndarray:
    """Run ``apply_fn`` (batched NHWC -> (N, h/8, w/8, 57)) over all
    windows of ``img`` as one batch and merge to a full-image stride-8
    map. Jittable for static image size. Pads the image (edge mode) to
    stride multiples — and up to the window size — when needed."""
    img_h, img_w = int(img.shape[0]), int(img.shape[1])
    tgt_h = max(img_h + (-img_h) % 8, win_h)
    tgt_w = max(img_w + (-img_w) % 8, win_w)
    if (tgt_h, tgt_w) != (img_h, img_w):
        img = jnp.pad(img, ((0, tgt_h - img_h), (0, tgt_w - img_w),
                            (0, 0)), mode="edge")
        img_h, img_w = tgt_h, tgt_w
    grid = generate_windows(img_h, img_w, win_h, win_w, overlap)
    wins = extract_windows(img, grid)           # (n, wh, ww, 3)
    maps = apply_fn(wins)                       # (n, wh/8, ww/8, 57)
    return merge_maps(maps, grid, out_scale=1.0 / 8.0)


def multiscale_forward(apply_fn, img: jnp.ndarray, win_h: int,
                       win_w: int, scales=(1.0,),
                       overlap: float = 0.2) -> jnp.ndarray:
    """True scale-search (reference ``_get_scaled_img`` float-scale
    semantics, ``tf_pose/estimator.py:~380`` + vendored slidingwindow):
    the image is resized to each fractional scale, every scale is
    covered with overlapping network-size windows whose outputs are
    distance-weight merged, and the per-scale stride-8 maps are
    area-resampled onto the native grid and averaged.

    TPU-native shape: each scale is ONE batched forward (static window
    grid), the cross-scale average happens on device; nothing leaves
    HBM until decode."""
    from tfpose_tpu.ops.resize import resize_area, resize_bilinear

    img_h, img_w = int(img.shape[0]), int(img.shape[1])
    base_h = (img_h + (-img_h) % 8) // 8
    base_w = (img_w + (-img_w) % 8) // 8
    acc = None
    for s in scales:
        if s == 1.0:
            scaled = img
        else:
            sh = max(int(round(img_h * s / 8.0)) * 8, 8)
            sw = max(int(round(img_w * s / 8.0)) * 8, 8)
            scaled = resize_bilinear(img.astype(jnp.float32), sh, sw)
        m = windowed_forward(apply_fn, scaled, win_h, win_w, overlap)
        if m.shape[:2] != (base_h, base_w):
            m = resize_area(m, base_h, base_w)
        acc = m if acc is None else acc + m
    return acc / len(scales)
