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
from tfpose_tpu.ops.assemble import Assembled, assemble_dense as assemble


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
    use_pallas = params.use_pallas
    if use_pallas is None:
        # auto: the fused kernel targets TPU (incl. the 'axon' tunnel
        # backend); CPU keeps the pure-XLA path
        use_pallas = jax.default_backend() not in ("cpu",)
    if use_pallas and heat_up.ndim == 3:
        from tfpose_tpu.ops.pallas.smooth_nms import smooth_nms_pallas
        peaks_map = smooth_nms_pallas(heat_up, params.smooth_kernel_size,
                                      params.smooth_sigma)
    else:
        smoothed = gaussian.smooth(heat_up, params.smooth_kernel_size,
                                   params.smooth_sigma)
        peaks_map = nms.nms(smoothed, params.nms_window)
    return peaks_map, heat_up, paf_up


def decode(net_out: jnp.ndarray, up_h: int, up_w: int,
           params: DecodeParams) -> Assembled:
    """Full decode from raw (H/8, W/8, 57) network output.

    On TPU the smooth+NMS+top-K stage runs as one fused Pallas kernel
    whose only HBM output is K peaks per part — the peaks plane never
    materialises.
    """
    use_pallas = params.use_pallas
    if use_pallas is None:
        use_pallas = jax.default_backend() not in ("cpu",)
    if not use_pallas:
        peaks_map, _, paf_up = postprocess(net_out, up_h, up_w, params)
        return decode_maps(peaks_map, paf_up, params)

    from tfpose_tpu.core.topology import NUM_PARTS
    from tfpose_tpu.ops.pallas.smooth_nms import (
        can_use_phase_kernel, smooth_nms_topk_pallas,
        smooth_nms_topk_raw_pallas)

    net_out = net_out.astype(jnp.float32)
    heat = net_out[..., :NUM_HEATMAP_CH]
    pafm = net_out[..., NUM_HEATMAP_CH:]
    h8, w8 = pafm.shape[0], pafm.shape[1]
    if can_use_phase_kernel(h8, w8, up_h, up_w,
                            params.smooth_kernel_size):
        # integer upsample: blur/NMS/top-K phase-decomposed on the raw
        # planes — the upsampled heat map never materialises
        scores, idx = smooth_nms_topk_raw_pallas(
            heat[..., :NUM_PARTS], up_h // h8, up_w // w8,
            params.max_peaks, params.thresh_heat,
            params.smooth_kernel_size, params.smooth_sigma)
    else:
        heat_up = resize.resize_area(heat, up_h, up_w)
        scores, idx = smooth_nms_topk_pallas(
            heat_up[..., :NUM_PARTS], params.max_peaks,
            params.thresh_heat, params.smooth_kernel_size,
            params.smooth_sigma)
    idx_safe = jnp.maximum(idx, 0)
    pk = nms.Peaks(x=(idx_safe % up_w).astype(jnp.int32),
                   y=(idx_safe // up_w).astype(jnp.int32),
                   score=scores, valid=scores > params.thresh_heat)
    if paf.can_use_pallas_sampling(h8, w8, up_h, up_w,
                                   params.max_peaks):
        # gather-free Pallas sampling on the RAW stride-8 planes —
        # the upsampled PAF map never materialises (integer-factor
        # area resize is exact replication)
        cands = paf.score_candidates_pallas(pk, pafm, up_h, up_w,
                                            params, prefix_valid=True)
    else:
        paf_up = resize.resize_area(pafm, up_h, up_w)
        cands = paf.score_candidates(pk, paf_up, params)
    conns = paf.greedy_connections(cands, params)
    out = assemble(pk, conns, params)
    scale = jnp.asarray([1.0 / up_w, 1.0 / up_h], jnp.float32)
    coords = jnp.where(out.coords >= 0, out.coords * scale, out.coords)
    return out._replace(coords=coords)


def decode_batch(net_out: jnp.ndarray, up_h: int, up_w: int,
                 params: DecodeParams) -> Assembled:
    """Batch-aware decode over (N, H/8, W/8, 57).

    The smooth+NMS+top-K kernel and the greedy/assembly stages batch
    well under vmap, but a vmapped PAF gather lowers to ~3x the
    per-image cost — so the gather runs batch-flattened
    (paf.score_candidates_batch). CPU keeps the plain vmapped path.
    """
    use_pallas = params.use_pallas
    if use_pallas is None:
        use_pallas = jax.default_backend() not in ("cpu",)
    if not use_pallas:
        return jax.vmap(lambda t: decode(t, up_h, up_w, params))(net_out)

    from tfpose_tpu.core.topology import NUM_PARTS
    from tfpose_tpu.ops.pallas.smooth_nms import (
        can_use_phase_kernel, smooth_nms_topk_pallas,
        smooth_nms_topk_raw_pallas)

    net_out = net_out.astype(jnp.float32)
    pafm = net_out[..., NUM_HEATMAP_CH:]
    b, h8, w8 = pafm.shape[0], pafm.shape[1], pafm.shape[2]
    # batch x part planes are homogeneous — flatten them into ONE
    # kernel call (channel axis b*18) instead of a vmap-lifted (b, 3)
    # grid: c_blk grows 6 -> 8 and the program count drops, amortising
    # launch/DMA and widening the per-round reduction ILP in the
    # top-K loop
    if can_use_phase_kernel(h8, w8, up_h, up_w,
                            params.smooth_kernel_size):
        hb = jnp.transpose(net_out[..., :NUM_PARTS],
                           (1, 2, 0, 3)).reshape(h8, w8, -1)
        s, i = smooth_nms_topk_raw_pallas(
            hb, up_h // h8, up_w // w8, params.max_peaks,
            params.thresh_heat, params.smooth_kernel_size,
            params.smooth_sigma)
        scores = s.reshape(b, NUM_PARTS, -1)
        idx = i.reshape(b, NUM_PARTS, -1)
    else:
        heat_up = resize.resize_area(net_out[..., :NUM_HEATMAP_CH],
                                     up_h, up_w)
        hb = jnp.transpose(heat_up[..., :NUM_PARTS],
                           (1, 2, 0, 3)).reshape(up_h, up_w, -1)
        s, i = smooth_nms_topk_pallas(
            hb, params.max_peaks, params.thresh_heat,
            params.smooth_kernel_size, params.smooth_sigma)
        scores = s.reshape(b, NUM_PARTS, -1)
        idx = i.reshape(b, NUM_PARTS, -1)
    idx_safe = jnp.maximum(idx, 0)
    pk = nms.Peaks(x=(idx_safe % up_w).astype(jnp.int32),
                   y=(idx_safe // up_w).astype(jnp.int32),
                   score=scores, valid=scores > params.thresh_heat)
    if paf.can_use_pallas_sampling(h8, w8, up_h, up_w,
                                   params.max_peaks):
        cands = paf.score_candidates_pallas_batch(pk, pafm, up_h, up_w,
                                                  params,
                                                  prefix_valid=True)
    else:
        paf_up = resize.resize_area(pafm, up_h, up_w)
        cands = paf.score_candidates_batch(pk, paf_up, params)
    conns = jax.vmap(
        lambda c: paf.greedy_connections(c, params))(cands)
    out = jax.vmap(lambda p, c: assemble(p, c, params))(pk, conns)
    scale = jnp.asarray([1.0 / up_w, 1.0 / up_h], jnp.float32)
    coords = jnp.where(out.coords >= 0, out.coords * scale, out.coords)
    return out._replace(coords=coords)


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def decode_jit(net_out: jnp.ndarray, up_h: int, up_w: int,
               params: DecodeParams) -> Assembled:
    return decode(net_out, up_h, up_w, params)


def decode_adaptive(net_out, up_h: int, up_w: int,
                    params: DecodeParams):
    """Host-side adaptive-K dispatch (round-3 verdict #5): decode with
    ``params``; when any part's peak cap saturated AND
    ``params.escalate_on_saturation``, re-decode through the
    ``params.escalated()`` pipeline — matching the reference's
    unbounded peak scan (pafprocess.cpp step 1) on crowded scenes
    while the common case pays only the small-K program.

    Returns ``(Assembled, escalated: bool)``. The escalated program
    compiles lazily on first saturation (cached by jit thereafter).
    Not jittable by design: the dispatch is data-dependent, and an
    on-device ``lax.cond`` degrades to both-branches-execute under
    vmap — the host dispatch keeps the batched common case clean.
    """
    import numpy as np

    out = decode_jit(net_out, up_h, up_w, params)
    esc = params.escalated()
    if (not params.escalate_on_saturation
            or esc.max_peaks == params.max_peaks
            or not bool(np.asarray(out.peak_saturated).any())):
        return out, False
    return decode_jit(net_out, up_h, up_w, esc), True
