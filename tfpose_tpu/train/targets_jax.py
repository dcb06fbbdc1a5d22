"""On-device training-target rasterization.

jnp ports of the reference target builders (``pose_dataset.py``
get_heatmap / get_vectormap, reimplemented in ``train/dataset.py`` as
NumPy): given padded joint arrays they render heatmaps and PAFs
directly on the TPU, so the host only ships (people, 18, 2) coordinate
tensors instead of rasterised planes — the data pipeline becomes
bandwidth-trivial and augmentation-bound.

Shapes are static: ``joints`` is (max_people, 18, 2) with NaN padding.
Jit/vmap-friendly; batched via vmap over the leading axis.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from tfpose_tpu.core.topology import (
    NUM_PAF_CH,
    pairs_array,
    paf_channels_array,
)


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def heatmap_targets(joints: jnp.ndarray, h: int, w: int,
                    sigma: float = 1.0) -> jnp.ndarray:
    """(P, 18, 2) pixel coords (NaN = missing) -> (h, w, 19) heatmaps.
    Reference put_heatmap: exp(-d^2 / sigma^2), max-combined, bg = 1-max.
    """
    yy = jnp.arange(h, dtype=jnp.float32)[:, None]
    xx = jnp.arange(w, dtype=jnp.float32)[None, :]
    px = joints[..., 0]  # (P, 18)
    py = joints[..., 1]
    valid = jnp.isfinite(px)
    px = jnp.where(valid, px, -1e6)
    py = jnp.where(valid, py, -1e6)
    # (P, 18, h, w) distances — P and parts are small; XLA fuses this
    d2 = ((xx[None, None] - px[..., None, None]) ** 2
          + (yy[None, None] - py[..., None, None]) ** 2)
    g = jnp.exp(-d2 / (sigma ** 2))
    g = jnp.where(valid[..., None, None], g, 0.0)
    parts = jnp.clip(g.max(axis=0), 0.0, 1.0)      # (18, h, w)
    bg = 1.0 - parts.max(axis=0, keepdims=True)    # (1, h, w)
    return jnp.concatenate([parts, bg], axis=0).transpose(1, 2, 0)


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def paf_targets(joints: jnp.ndarray, h: int, w: int,
                threshold: float = 1.0) -> jnp.ndarray:
    """(P, 18, 2) -> (h, w, 38) count-normalised PAF targets."""
    pairs = jnp.asarray(pairs_array())
    yy = jnp.arange(h, dtype=jnp.float32)[:, None]
    xx = jnp.arange(w, dtype=jnp.float32)[None, :]

    a = joints[:, pairs[:, 0], :]  # (P, 19, 2)
    b = joints[:, pairs[:, 1], :]
    valid = jnp.isfinite(a[..., 0]) & jnp.isfinite(b[..., 0])
    a = jnp.nan_to_num(a)
    b = jnp.nan_to_num(b)
    d = b - a
    norm = jnp.sqrt((d ** 2).sum(-1))
    ok = valid & (norm > 1e-6)
    v = d / jnp.maximum(norm, 1e-6)[..., None]  # (P, 19, 2)

    rel_x = xx[None, None] - a[..., 0][..., None, None]  # (P,19,h,w)
    rel_y = yy[None, None] - a[..., 1][..., None, None]
    t = (rel_x * v[..., 0][..., None, None]
         + rel_y * v[..., 1][..., None, None]) / \
        jnp.maximum(norm, 1e-6)[..., None, None]
    t = jnp.clip(t, 0.0, 1.0)
    dist = jnp.sqrt(
        (rel_x - t * d[..., 0][..., None, None]) ** 2
        + (rel_y - t * d[..., 1][..., None, None]) ** 2)
    mask = (dist <= threshold) & ok[..., None, None]  # (P, 19, h, w)

    vx = jnp.where(mask, v[..., 0][..., None, None], 0.0).sum(0)
    vy = jnp.where(mask, v[..., 1][..., None, None], 0.0).sum(0)
    cnt = jnp.maximum(mask.sum(0), 1).astype(jnp.float32)  # (19, h, w)
    vx = vx / cnt
    vy = vy / cnt

    # interleave into the 38-channel layout via the pair->channel map
    out = jnp.zeros((NUM_PAF_CH, h, w), jnp.float32)
    pc = paf_channels_array()
    out = out.at[jnp.asarray(pc[:, 0])].set(vx)
    out = out.at[jnp.asarray(pc[:, 1])].set(vy)
    return out.transpose(1, 2, 0)


def batch_targets(joints_batch: jnp.ndarray, h: int, w: int,
                  sigma: float = 1.0, threshold: float = 1.0):
    """(N, P, 18, 2) -> dict of batched targets (on device)."""
    heat = jax.vmap(lambda j: heatmap_targets(j, h, w, sigma))(
        joints_batch)
    paf = jax.vmap(lambda j: paf_targets(j, h, w, threshold))(
        joints_batch)
    return {"heat": heat, "paf": paf}
