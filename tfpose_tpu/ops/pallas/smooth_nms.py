"""Fused Gaussian-smooth + max-pool-NMS Pallas TPU kernel.

Replaces two XLA ops of the decode post-path (separable depthwise
Gaussian + 3x3 reduce_window/select, see ``ops/gaussian.py`` /
``ops/nms.py``) with one VMEM-resident kernel: each grid program loads
one heatmap channel plane, applies the separable 25-tap blur with
statically shifted slices, computes the 3x3 neighbourhood max, and
writes the NMS'd peaks plane — one HBM round trip instead of three.

Layout: channels-first (C, H, W) so the innermost (lane) dimension is
the image width; H rides the sublanes. All slice offsets are Python
ints (unrolled), so only static slicing is used — the Mosaic TPU
lowering here supports neither dynamic_slice nor scatter on values.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tfpose_tpu.ops.gaussian import gauss_kernel_1d


def _kernel(x_ref, out_ref, *, kern: tuple, pad: int, h: int, w: int):
    """x_ref: (1, H+2p, W+2p) padded plane; out_ref: (1, H, W)."""
    x = x_ref[0]  # (H+2p, W+2p)
    # vertical 25-tap pass over the valid rows (static slices, unrolled)
    acc_v = kern[0] * x[0:h, :]
    for k in range(1, len(kern)):
        acc_v = acc_v + kern[k] * x[k:k + h, :]
    # horizontal 25-tap pass
    sm = kern[0] * acc_v[:, 0:w]
    for k in range(1, len(kern)):
        sm = sm + kern[k] * acc_v[:, k:k + w]
    # 3x3 neighbourhood max: neighbours via shifted slices of acc
    # planes; SAME-padding edges handled by padding sm with -inf
    neg = jnp.float32(-jnp.inf)
    mx = sm
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            sh = pltpu.roll(sm, shift=dy % h, axis=0)
            sh = pltpu.roll(sh, shift=dx % w, axis=1)
            # mask the wrapped rows/cols to -inf
            row_ids = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
            col_ids = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
            valid = jnp.ones((h, w), jnp.bool_)
            if dy == 1:
                valid = valid & (row_ids >= 1)
            if dy == -1:
                valid = valid & (row_ids < h - 1)
            if dx == 1:
                valid = valid & (col_ids >= 1)
            if dx == -1:
                valid = valid & (col_ids < w - 1)
            mx = jnp.maximum(mx, jnp.where(valid, sh, neg))
    out_ref[0] = jnp.where(sm >= mx, sm, jnp.zeros_like(sm))


def _topk_rounds(peaks, fi2, big, k_top: int):
    """Iterative exact top-K over ``c_blk`` peak planes (suppressed
    values -inf), shared by the full-res and phase kernels.

    Each round is two cheap VPU reduces per channel — max, then
    min-index among ties (matches jax.lax.top_k / the reference C++
    scan's row-major preference) — with the channel loop INSIDE the
    round so the c_blk reductions are mutually independent (ILP).
    The rounds run under a ``while_loop`` that exits as soon as a round
    finds no peak in any channel: real scenes have ~n_people peaks per
    part, so decode stops after a handful of rounds instead of always
    paying k_top full-plane scans (worst-case noise still runs all
    k_top rounds; results are bit-identical either way because
    exhausted rounds were already no-ops).

    Returns (scores, idxs): tuples of (8, 128) accumulator tiles.
    """
    neg = jnp.float32(-jnp.inf)
    c_blk = len(peaks)
    lane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0) * 128 + \
        jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    # rounds per while iteration: unrolling amortises the loop's scalar
    # overhead on peak-dense (worst-case noise) inputs; the exit check
    # between chunks still skips ~7/8 of the rounds on real scenes
    chunk = 4 if k_top % 4 == 0 else 1

    def cond(carry):
        t, alive = carry[0], carry[1]
        return (t < k_top) & (alive > 0)

    def body(carry):
        t, _, planes, scores, idxs = carry
        planes, scores, idxs = list(planes), list(scores), list(idxs)
        for r in range(chunk):
            founds = []
            for c in range(c_blk):
                pc = planes[c]
                m = jnp.max(pc)
                idx = jnp.min(jnp.where(pc >= m, fi2, big))
                found = m > neg
                founds.append(found)
                sel = (lane == t + r) & found
                scores[c] = jnp.where(sel, m, scores[c])
                idxs[c] = jnp.where(sel, idx, idxs[c])
                planes[c] = jnp.where(fi2 == idx, neg, pc)
        # exit when the chunk's LAST round found nothing anywhere: a
        # later round can never find what this one could not
        alive = founds[0]
        for f in founds[1:]:
            alive = alive | f
        return (t + chunk, alive.astype(jnp.int32), tuple(planes),
                tuple(scores), tuple(idxs))

    init = (jnp.int32(0), jnp.int32(1), tuple(peaks),
            tuple(jnp.zeros((8, 128), jnp.float32)
                  for _ in range(c_blk)),
            tuple(jnp.full((8, 128), -1, jnp.int32)
                  for _ in range(c_blk)))
    _, _, _, scores, idxs = jax.lax.while_loop(cond, body, init)
    return scores, idxs


def _topk_kernel(x_ref, scores_ref, idx_ref, *, kern: tuple, pad: int,
                 h: int, w: int, k_top: int, thresh: float,
                 c_blk: int):
    """Fused smooth+NMS+top-K over a block of ``c_blk`` channel planes
    per grid program (the Gaussian taps are channel-independent, so
    blur/NMS vectorise over the block; per-program launch/DMA overhead
    amortises c_blk-fold). Emits (c_blk, K) scores and flat indices —
    the peaks plane never reaches HBM."""
    x = x_ref[...]  # (c_blk, H+2p, W+2p)
    acc_v = kern[0] * x[:, 0:h, :]
    for k in range(1, len(kern)):
        acc_v = acc_v + kern[k] * x[:, k:k + h, :]
    sm = kern[0] * acc_v[:, :, 0:w]
    for k in range(1, len(kern)):
        sm = sm + kern[k] * acc_v[:, :, k:k + w]
    neg = jnp.float32(-jnp.inf)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (c_blk, h, w), 1)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (c_blk, h, w), 2)
    mx = sm
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            sh = pltpu.roll(sm, shift=dy % h, axis=1)
            sh = pltpu.roll(sh, shift=dx % w, axis=2)
            valid = jnp.ones((c_blk, h, w), jnp.bool_)
            if dy == 1:
                valid = valid & (row_ids >= 1)
            if dy == -1:
                valid = valid & (row_ids < h - 1)
            if dx == 1:
                valid = valid & (col_ids >= 1)
            if dx == -1:
                valid = valid & (col_ids < w - 1)
            mx = jnp.maximum(mx, jnp.where(valid, sh, neg))
    # peaks planes, suppressed values -> -inf so top-k ignores them
    flat_idx = row_ids * w + col_ids
    peaks_blk = jnp.where((sm >= mx) & (sm > thresh), sm, neg)

    # iterative exact top-K with early exit (see _topk_rounds); all
    # per-round ops stay 2-D — Mosaic's layout pass crashes on
    # (c, 1, 1) keepdims reductions. Results accumulate in (8, 128)
    # register tiles (TPU-aligned), written once at the end.
    fi2 = flat_idx[0]                                   # (h, w), same /ch
    peaks = [peaks_blk[c] for c in range(c_blk)]
    scores_acc, idx_acc = _topk_rounds(peaks, fi2, jnp.int32(h * w),
                                       k_top)
    for c in range(c_blk):
        scores_ref[c] = scores_acc[c]
        idx_ref[c] = idx_acc[c]


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4, 5))
def smooth_nms_topk_pallas(heat: jnp.ndarray, k_top: int,
                           thresh: float, kernlen: int = 25,
                           nsig: float = 3.0,
                           interpret: bool = False):
    """(H, W, C) fp32 -> (scores (C, K), flat_idx (C, K) int32):
    the reference Smoother + NMS + the C++ decoder's peak scan, fused
    into one kernel whose only HBM output is K peaks per part."""
    h, w, c = heat.shape
    pad = kernlen // 2
    kern = tuple(float(v) for v in gauss_kernel_1d(kernlen, nsig))
    if k_top > 1024:
        raise ValueError("k_top must be <= 1024 (8x128 result tile)")
    # largest channel block that divides c and fits the scoped VMEM
    # budget (~5 working planes per channel); bigger blocks amortise
    # launch/DMA and widen the per-round reduction ILP in _topk_rounds
    per_ch = (4 * h * w + (h + 2 * pad) * (w + 2 * pad)
              + h * (w + 2 * pad)) * 4
    c_blk = 1
    for cand in (8, 6, 4, 3, 2):
        if c % cand == 0 and cand * per_ch <= 10 * 1024 * 1024:
            c_blk = cand
            break
    x = jnp.transpose(heat, (2, 0, 1))
    x = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad)))
    scores, idx = pl.pallas_call(
        functools.partial(_topk_kernel, kern=kern, pad=pad, h=h, w=w,
                          k_top=k_top, thresh=thresh, c_blk=c_blk),
        out_shape=(jax.ShapeDtypeStruct((c, 8, 128), jnp.float32),
                   jax.ShapeDtypeStruct((c, 8, 128), jnp.int32)),
        grid=(c // c_blk,),
        in_specs=[pl.BlockSpec((c_blk, h + 2 * pad, w + 2 * pad),
                               lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec((c_blk, 8, 128), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((c_blk, 8, 128), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x)
    flat_s = scores.reshape(c, 8 * 128)[:, :k_top]
    flat_i = idx.reshape(c, 8 * 128)[:, :k_top]
    return flat_s, flat_i


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def smooth_nms_pallas(heat: jnp.ndarray, kernlen: int = 25,
                      nsig: float = 3.0,
                      interpret: bool = False) -> jnp.ndarray:
    """(H, W, C) fp32 -> NMS'd peaks plane (H, W, C), fusing the
    reference Smoother + tf.nn.pool NMS semantics."""
    h, w, c = heat.shape
    pad = kernlen // 2
    kern = tuple(float(v) for v in gauss_kernel_1d(kernlen, nsig))
    # channels-first with zero padding (SAME conv semantics)
    x = jnp.transpose(heat, (2, 0, 1))
    x = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad)))

    out = pl.pallas_call(
        functools.partial(_kernel, kern=kern, pad=pad, h=h, w=w),
        out_shape=jax.ShapeDtypeStruct((c, h, w), x.dtype),
        grid=(c,),
        in_specs=[pl.BlockSpec((1, h + 2 * pad, w + 2 * pad),
                               lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x)
    return jnp.transpose(out, (1, 2, 0))


# ---------------------------------------------------------------------------
# Phase-decomposed variant: smooth+NMS+top-K directly on the RAW
# stride-8 planes (exact for integer upsample factors)
# ---------------------------------------------------------------------------

def _phase_weights(kern, f: int, p: int):
    """Group the 1-D blur taps by raw-grid cell, per output phase.

    With integer-factor area upsampling, up[X] = raw[X // f], so the
    blurred value at X = f*i + a is
      sum_k kern[k] * up[X + k - p] = sum_d W[a, d] * raw[i + d]
    where d = floor((a + k - p) / f). The grouping is exact under the
    reference's zero padding of the UPSAMPLED map because a raw cell
    outside [0, n) only ever receives taps whose upsampled position is
    also outside [0, f*n). Returns ((f, n_d) weights, dmin, dmax).
    """
    import numpy as np

    nk = len(kern)
    dmin = min(int(np.floor((a - p) / f)) for a in range(f))
    dmax = max(int(np.floor((a + nk - 1 - p) / f)) for a in range(f))
    w = np.zeros((f, dmax - dmin + 1), np.float64)
    for a in range(f):
        for k in range(nk):
            d = int(np.floor((a + k - p) / f))
            w[a, d - dmin] += kern[k]
    return w.astype(np.float32), dmin, dmax


def _topk_phase_kernel(x_ref, scores_ref, idx_ref, *, wv: tuple,
                       wh: tuple, h8: int, w8: int, fy: int, fx: int,
                       k_top: int, thresh: float, c_blk: int):
    """Blur/NMS/top-K on raw planes via phase decomposition.

    x_ref: (c_blk, h8 + nv - 1, w8 + nh - 1) zero-padded raw planes.
    Emits the same (c_blk, 8, 128) score/idx tiles as _topk_kernel,
    with flat indices in UPSAMPLED (fy*h8 x fx*w8) coordinates — the
    upsampled heat plane never exists anywhere.
    """
    neg = jnp.float32(-jnp.inf)
    nv = len(wv[0])
    nh = len(wh[0])
    x = x_ref[...]

    # vertical phase convs: fy planes of (c, h8, w8 + nh - 1)
    vs = []
    for a in range(fy):
        acc = wv[a][0] * x[:, 0:h8, :]
        for t in range(1, nv):
            if wv[a][t] != 0.0:
                acc = acc + wv[a][t] * x[:, t:t + h8, :]
        vs.append(acc)
    # horizontal: (fy, fx) planes of (c, h8, w8)
    sm = {}
    for a in range(fy):
        for b in range(fx):
            acc = wh[b][0] * vs[a][:, :, 0:w8]
            for t in range(1, nh):
                if wh[b][t] != 0.0:
                    acc = acc + wh[b][t] * vs[a][:, :, t:t + w8]
            sm[(a, b)] = acc

    row_ids = jax.lax.broadcasted_iota(jnp.int32, (c_blk, h8, w8), 1)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (c_blk, h8, w8), 2)

    # 3x3 NMS on the upsampled grid: the neighbour of phase (a, b) in
    # direction (dy, dx) lives in phase ((a+dy)%fy, (b+dx)%fx) at raw
    # offset (floor((a+dy)/fy), floor((b+dx)/fx)) — static rolls+masks.
    peaks = {}
    for a in range(fy):
        for b in range(fx):
            mx = sm[(a, b)]
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    if dy == 0 and dx == 0:
                        continue
                    a2, di = (a + dy) % fy, (a + dy) // fy
                    b2, dj = (b + dx) % fx, (b + dx) // fx
                    sh = sm[(a2, b2)]
                    if di:
                        sh = pltpu.roll(sh, shift=(-di) % h8, axis=1)
                    if dj:
                        sh = pltpu.roll(sh, shift=(-dj) % w8, axis=2)
                    valid = jnp.ones((c_blk, h8, w8), jnp.bool_)
                    if di == 1:
                        valid = valid & (row_ids < h8 - 1)
                    if di == -1:
                        valid = valid & (row_ids >= 1)
                    if dj == 1:
                        valid = valid & (col_ids < w8 - 1)
                    if dj == -1:
                        valid = valid & (col_ids >= 1)
                    mx = jnp.maximum(mx, jnp.where(valid, sh, neg))
            s = sm[(a, b)]
            peaks[(a, b)] = jnp.where((s >= mx) & (s > thresh), s, neg)

    # stack phases along lanes: q = (a*fx + b)*w8 + j
    stacked = jnp.concatenate(
        [peaks[(a, b)] for a in range(fy) for b in range(fx)], axis=2)
    q_tot = fy * fx * w8
    i_ids = jax.lax.broadcasted_iota(jnp.int32, (h8, q_tot), 0)
    q_ids = jax.lax.broadcasted_iota(jnp.int32, (h8, q_tot), 1)
    a_ids = q_ids // (fx * w8)
    r_ids = q_ids - a_ids * (fx * w8)
    b_ids = r_ids // w8
    j_ids = r_ids - b_ids * w8
    up_w = fx * w8
    fi2 = (fy * i_ids + a_ids) * up_w + fx * j_ids + b_ids
    big = jnp.int32(fy * h8 * up_w)

    planes = [stacked[c] for c in range(c_blk)]
    scores_acc, idx_acc = _topk_rounds(planes, fi2, big, k_top)
    for c in range(c_blk):
        scores_ref[c] = scores_acc[c]
        idx_ref[c] = idx_acc[c]


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4, 5, 6, 7))
def smooth_nms_topk_raw_pallas(heat8: jnp.ndarray, fy: int, fx: int,
                               k_top: int, thresh: float,
                               kernlen: int = 25, nsig: float = 3.0,
                               interpret: bool = False):
    """(h8, w8, C) RAW fp32 planes -> (scores (C, K), flat idx (C, K))
    in upsampled (fy*h8, fx*w8) coordinates.

    Bit-equivalent (up to fp32 summation order) to area-upsampling by
    (fy, fx) and running :func:`smooth_nms_topk_pallas`, but the blur
    runs phase-decomposed on the raw grid: ~(fy*fx)x less input DMA
    and ~fy x less multiply work, and the upsampled plane is never
    materialised in HBM at all.
    """
    h8, w8, c = heat8.shape
    p = kernlen // 2
    kern = gauss_kernel_1d(kernlen, nsig)
    wv, dvmin, dvmax = _phase_weights(kern, fy, p)
    wh, dhmin, dhmax = _phase_weights(kern, fx, p)
    wv_t = tuple(tuple(float(v) for v in row) for row in wv)
    wh_t = tuple(tuple(float(v) for v in row) for row in wh)
    nv, nh = wv.shape[1], wh.shape[1]
    if k_top > 1024:
        raise ValueError("k_top must be <= 1024 (8x128 result tile)")
    # Pick the largest channel block whose live VMEM footprint fits the
    # scoped budget: each channel holds ~3 upsample-sized planes (sm +
    # peaks + stacked concat) plus the padded input and fy vertical
    # phase planes. At fy=fx=8 on production plane sizes c_blk=6 would
    # blow the ~16 MB scoped limit — shrink instead of failing Mosaic
    # allocation at runtime (advisor r2 finding).
    per_ch = (3 * fy * fx * h8 * w8 + fy * h8 * (w8 + nh - 1)
              + (h8 + nv - 1) * (w8 + nh - 1)) * 4
    budget = 10 * 1024 * 1024
    c_blk = 1
    for cand in (8, 6, 4, 3, 2):
        if c % cand == 0 and cand * per_ch <= budget:
            c_blk = cand
            break
    x = jnp.transpose(heat8.astype(jnp.float32), (2, 0, 1))
    # pad (-dmin) before / dmax after so kernel slice t maps to raw
    # offset dmin + t exactly
    x = jnp.pad(x, ((0, 0), (-dvmin, dvmax), (-dhmin, dhmax)))
    scores, idx = pl.pallas_call(
        functools.partial(_topk_phase_kernel, wv=wv_t, wh=wh_t, h8=h8,
                          w8=w8, fy=fy, fx=fx, k_top=k_top,
                          thresh=thresh, c_blk=c_blk),
        out_shape=(jax.ShapeDtypeStruct((c, 8, 128), jnp.float32),
                   jax.ShapeDtypeStruct((c, 8, 128), jnp.int32)),
        grid=(c // c_blk,),
        in_specs=[pl.BlockSpec((c_blk, h8 + nv - 1, w8 + nh - 1),
                               lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec((c_blk, 8, 128), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((c_blk, 8, 128), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x)
    flat_s = scores.reshape(c, 8 * 128)[:, :k_top]
    flat_i = idx.reshape(c, 8 * 128)[:, :k_top]
    return flat_s, flat_i


def can_use_phase_kernel(h8: int, w8: int, up_h: int, up_w: int,
                         kernlen: int = 25) -> bool:
    """The raw-grid kernel is exact iff the upsample is a pure integer
    replication; phase count is bounded to keep VMEM plane counts sane,
    and even a single-channel block must fit the scoped VMEM budget
    (the c_blk chooser above can shrink to 1 but no further)."""
    if h8 <= 0 or w8 <= 0 or up_h % h8 or up_w % w8:
        return False
    fy, fx = up_h // h8, up_w // w8
    if not (1 <= fy <= 8 and 1 <= fx <= 8):
        return False
    nv = kernlen // fy + 2
    nh = kernlen // fx + 2
    per_ch = (3 * fy * fx * h8 * w8 + fy * h8 * (w8 + nh - 1)
              + (h8 + nv - 1) * (w8 + nh - 1)) * 4
    return per_ch <= 10 * 1024 * 1024
