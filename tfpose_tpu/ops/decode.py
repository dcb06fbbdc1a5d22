"""End-to-end fused pose decode: network output -> padded humans.

Replaces the reference's split post-path — in-graph upsample/smooth/NMS
(``tf_pose/estimator.py:~310-470``) followed by host-side C++ greedy
assembly (``tf_pose/pafprocess/``) — with ONE jittable function that
never leaves the device. Batched via vmap; all shapes static.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from tfpose_tpu.core.config import DecodeParams
from tfpose_tpu.core.topology import NUM_HEATMAP_CH
from tfpose_tpu.ops import gaussian, nms, paf, resize
from tfpose_tpu.ops.assemble import Assembled, assemble


def decode_maps(peaks_map: jnp.ndarray, paf_up: jnp.ndarray,
                params: DecodeParams) -> Assembled:
    """Decode from an NMS'd peaks plane + upsampled PAF map.

    Coordinates in the result are normalised to [0, 1] by the heatmap
    size, matching reference ``PoseEstimator.estimate_paf``.
    """
    h, w, _ = peaks_map.shape
    pk = nms.top_peaks(peaks_map, params.max_peaks, params.thresh_heat)
    cands = paf.score_candidates(pk, paf_up, params)
    conns = paf.greedy_connections(cands, params)
    out = assemble(pk, conns, params)
    scale = jnp.asarray([1.0 / w, 1.0 / h], jnp.float32)
    coords = jnp.where(out.coords >= 0, out.coords * scale, out.coords)
    return out._replace(coords=coords)


def postprocess(net_out: jnp.ndarray, up_h: int, up_w: int,
                params: DecodeParams
                ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Reference post-graph on a (H/8, W/8, 57) network output:
    split -> area-upsample -> Gaussian smooth -> NMS.

    Returns (peaks_map, heat_up, paf_up), all (up_h, up_w, C) fp32 —
    decode precision stays fp32 even when the backbone runs bf16.
    """
    net_out = net_out.astype(jnp.float32)
    heat = net_out[..., :NUM_HEATMAP_CH]
    pafm = net_out[..., NUM_HEATMAP_CH:]
    heat_up = resize.resize_area(heat, up_h, up_w)
    paf_up = resize.resize_area(pafm, up_h, up_w)
    smoothed = gaussian.smooth(heat_up, params.smooth_kernel_size,
                               params.smooth_sigma)
    peaks_map = nms.nms(smoothed, params.nms_window)
    return peaks_map, heat_up, paf_up


def decode(net_out: jnp.ndarray, up_h: int, up_w: int,
           params: DecodeParams) -> Assembled:
    """Full decode from raw (H/8, W/8, 57) network output."""
    peaks_map, _, paf_up = postprocess(net_out, up_h, up_w, params)
    return decode_maps(peaks_map, paf_up, params)


def decode_batch(net_out: jnp.ndarray, up_h: int, up_w: int,
                 params: DecodeParams) -> Assembled:
    """vmapped decode over a leading batch dim: (N, H/8, W/8, 57)."""
    return jax.vmap(lambda t: decode(t, up_h, up_w, params))(net_out)


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def decode_jit(net_out: jnp.ndarray, up_h: int, up_w: int,
               params: DecodeParams) -> Assembled:
    return decode(net_out, up_h, up_w, params)
