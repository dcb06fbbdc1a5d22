#!/usr/bin/env python
"""Stage-level TPU profile of the decode pipeline (round-2 perf work).

Times each decode stage with amortized_ms (differential scan) on random
network outputs at the headline config (thin 432x368, up 4x), b=1 and
b=16. Run on TPU: `python scripts/profile_stages.py [b]`.
"""
import sys

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from tfpose_tpu.core.config import DecodeParams
from tfpose_tpu.core.topology import NUM_HEATMAP_CH, NUM_PARTS
from tfpose_tpu.ops import nms, paf, resize
from tfpose_tpu.ops.assemble import assemble_dense as assemble
from tfpose_tpu.ops.decode import decode_batch
from tfpose_tpu.utils.cache import enable_compilation_cache
from tfpose_tpu.utils.profiling import amortized_ms


def main():
    enable_compilation_cache()
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    h8, w8 = 368 // 8, 432 // 8
    up_h, up_w = h8 * 4, w8 * 4
    params = DecodeParams()
    rng = np.random.default_rng(0)
    scans = 32 if batch == 1 else 8

    net_out = jnp.asarray(rng.normal(
        0, 0.3, (scans, batch, h8, w8, 57)).astype(np.float32))

    def per_img(ms):
        return ms / batch

    from tfpose_tpu.ops.pallas.smooth_nms import smooth_nms_topk_pallas

    def stage_resize(t):
        out = resize.resize_area(t[..., :NUM_HEATMAP_CH], up_h, up_w)
        return out.sum()

    def stage_topk(t):
        heat_up = resize.resize_area(t[..., :NUM_HEATMAP_CH], up_h, up_w)
        scores, idx = jax.vmap(lambda x: smooth_nms_topk_pallas(
            x, params.max_peaks, params.thresh_heat,
            params.smooth_kernel_size, params.smooth_sigma)
        )(heat_up[..., :NUM_PARTS])
        return scores.sum() + idx.sum()

    def make_peaks(t):
        heat_up = resize.resize_area(t[..., :NUM_HEATMAP_CH], up_h, up_w)
        scores, idx = jax.vmap(lambda x: smooth_nms_topk_pallas(
            x, params.max_peaks, params.thresh_heat,
            params.smooth_kernel_size, params.smooth_sigma)
        )(heat_up[..., :NUM_PARTS])
        idx_safe = jnp.maximum(idx, 0)
        return nms.Peaks(x=(idx_safe % up_w).astype(jnp.int32),
                         y=(idx_safe // up_w).astype(jnp.int32),
                         score=scores, valid=scores > params.thresh_heat)

    def stage_paf(t):
        pk = make_peaks(t)
        pafm = t[..., NUM_HEATMAP_CH:].astype(jnp.float32)
        cands = jax.vmap(lambda p, m: paf.score_candidates_pallas(
            p, m, up_h, up_w, params))(pk, pafm)
        return cands.score.sum()

    def stage_greedy(t):
        pk = make_peaks(t)
        pafm = t[..., NUM_HEATMAP_CH:].astype(jnp.float32)
        cands = jax.vmap(lambda p, m: paf.score_candidates_pallas(
            p, m, up_h, up_w, params))(pk, pafm)
        conns = jax.vmap(lambda c: paf.greedy_connections(c, params))(cands)
        return conns.score.sum()

    def stage_full(t):
        d = decode_batch(t, up_h, up_w, params)
        return d.human_scores.sum()

    stages = [
        ("resize_heat", stage_resize),
        ("+smooth_nms_topk", stage_topk),
        ("+paf_sampling", stage_paf),
        ("+greedy", stage_greedy),
        ("full_decode", stage_full),
    ]
    prev = 0.0
    print(f"batch={batch} thin 432x368 up4x  (cumulative | delta) per img")
    for name, fn in stages:
        ms = per_img(amortized_ms(fn, net_out))
        print(f"  {name:18s} {ms:7.3f} ms | +{ms - prev:6.3f} ms")
        prev = ms


if __name__ == "__main__":
    main()
