"""PAF line-integral candidate scoring and greedy connection selection.

TPU-native reformulation of the reference native decoder's steps 2-3
(``tf_pose/pafprocess/pafprocess.cpp``): every (peak_a, peak_b) candidate
of every limb pair is scored in one batched computation —
(pairs, K, K, step_paf) sample points, a single flat gather from the PAF
map, and vectorised reductions. Greedy non-conflicting selection is an
iterated masked argmax, vmapped over pairs; it provably selects the same
connection set as the reference's sort-then-skip-conflicts loop.

Sampling matches the reference exactly: sample i (0 <= i < STEP_PAF) at
round_half_up(a + i * (b - a) / STEP_PAF); score = dot(PAF, unit dir);
criterion1 = #(samples > THRESH_VECTOR_SCORE) > THRESH_VECTOR_CNT1;
criterion2 = mean + min(0, 0.5 * H / dist - 1) > 0.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from tfpose_tpu.core.config import DecodeParams
from tfpose_tpu.core.topology import pairs_array, paf_channels_array
from tfpose_tpu.ops.nms import Peaks


class Candidates(NamedTuple):
    """Per-pair candidate scores; arrays are (num_pairs, K, K)."""

    score: jnp.ndarray   # criterion2 (length-penalised mean PAF score)
    ok: jnp.ndarray      # bool: passes both criteria and endpoints valid


class Connections(NamedTuple):
    """Greedy-selected connections; arrays are (num_pairs, K).

    Invariant: valid connections occupy slots 0..m-1 contiguously per
    pair (greedy fills slots in acceptance order and acceptance is
    monotone). ``ops.assemble`` relies on this to stop its per-pair
    walks at the first invalid slot."""

    a_slot: jnp.ndarray  # int32 slot into peaks of part pairs[p][0]
    b_slot: jnp.ndarray  # int32 slot into peaks of part pairs[p][1]
    score: jnp.ndarray   # float32 connection score
    valid: jnp.ndarray   # bool


def _candidate_geometry(peaks: Peaks, h: int, w: int,
                        params: DecodeParams):
    """Per-image candidate geometry: endpoint validity, direction
    vectors, distances, and rounded sample-point flat indices."""
    pairs = jnp.asarray(pairs_array())          # (19, 2)

    ax = peaks.x[pairs[:, 0]].astype(jnp.float32)
    ay = peaks.y[pairs[:, 0]].astype(jnp.float32)
    av = peaks.valid[pairs[:, 0]]
    bx = peaks.x[pairs[:, 1]].astype(jnp.float32)
    by = peaks.y[pairs[:, 1]].astype(jnp.float32)
    bv = peaks.valid[pairs[:, 1]]

    # (19, K, K) candidate geometry: a varies over axis 1, b over axis 2
    dx = bx[:, None, :] - ax[:, :, None]
    dy = by[:, None, :] - ay[:, :, None]
    norm = jnp.sqrt(dx * dx + dy * dy)
    safe = norm > 1e-12
    inv = jnp.where(safe, 1.0 / jnp.maximum(norm, 1e-12), 0.0)
    vx = dx * inv
    vy = dy * inv

    # sample points: (19, K, K, S)
    steps = jnp.arange(params.step_paf, dtype=jnp.float32) / params.step_paf
    sx = ax[:, :, None, None] + dx[..., None] * steps
    sy = ay[:, :, None, None] + dy[..., None] * steps
    # reference roundpaf: floor(v + 0.5) (round half up, coords >= 0)
    ix = jnp.clip(jnp.floor(sx + 0.5).astype(jnp.int32), 0, w - 1)
    iy = jnp.clip(jnp.floor(sy + 0.5).astype(jnp.int32), 0, h - 1)
    flat = iy * w + ix
    return (vx, vy, norm, safe, av, bv, flat)


def _score_from_rows(rows, vx, vy, norm, safe, av, bv, h,
                     params: DecodeParams) -> Candidates:
    """rows: (19, K, K, S, 38) gathered PAF rows -> Candidates."""
    pc = paf_channels_array()
    sel = np.zeros((pc.shape[0], 38, 2), np.float32)
    sel[np.arange(19), pc[:, 0], 0] = 1.0
    sel[np.arange(19), pc[:, 1], 1] = 1.0
    pxy = jnp.einsum("pabsc,pcd->pabsd", rows, jnp.asarray(sel),
                     precision=jax.lax.Precision.HIGHEST)
    s = vx[..., None] * pxy[..., 0] + vy[..., None] * pxy[..., 1]

    cnt = jnp.sum(s > params.thresh_vector_score, axis=-1)
    mean = jnp.mean(s, axis=-1)
    penalty = jnp.minimum(0.0, 0.5 * h / jnp.maximum(norm, 1e-12) - 1.0)
    criterion2 = mean + penalty
    ok = ((cnt > params.thresh_vector_cnt1)
          & (criterion2 > 0.0)
          & safe
          & av[:, :, None] & bv[:, None, :])
    return Candidates(score=criterion2, ok=ok)


def score_candidates(peaks: Peaks, paf_up: jnp.ndarray,
                     params: DecodeParams) -> Candidates:
    """Score all candidates. ``paf_up``: (H, W, 38) upsampled PAF map.

    Row-gather formulation: one vectorised gather of full 38-channel
    rows (contiguous lane loads beat 2 scalar gathers per sample on
    TPU), then per-pair channel selection as a tiny one-hot
    contraction that XLA fuses into the gather's consumer.
    """
    h, w, _ = paf_up.shape
    vx, vy, norm, safe, av, bv, flat = _candidate_geometry(
        peaks, h, w, params)
    rows = paf_up.reshape(-1, paf_up.shape[-1])[flat]
    return _score_from_rows(rows, vx, vy, norm, safe, av, bv, h, params)


def score_candidates_batch(peaks_b: Peaks, paf_up_b: jnp.ndarray,
                           params: DecodeParams) -> Candidates:
    """Batched candidate scoring with ONE flat gather.

    ``peaks_b`` fields are (B, 19parts..., K)-leading; ``paf_up_b`` is
    (B, H, W, 38). A vmapped gather lowers poorly on TPU (measured
    ~3x the per-image cost of the single-image path); flattening the
    batch into the gather indices makes it one large gather, which XLA
    handles at full bandwidth.
    """
    b, h, w, c = paf_up_b.shape
    geo = jax.vmap(
        lambda pk: _candidate_geometry(pk, h, w, params))(peaks_b)
    vx, vy, norm, safe, av, bv, flat = geo
    offs = (jnp.arange(b, dtype=jnp.int32) * (h * w)
            )[:, None, None, None, None]
    rows = paf_up_b.reshape(-1, c)[flat + offs]  # (B,19,K,K,S,38)
    return jax.vmap(
        lambda r, a1, a2, a3, a4, a5, a6: _score_from_rows(
            r, a1, a2, a3, a4, a5, a6, h, params)
    )(rows, vx, vy, norm, safe, av, bv)


def score_candidates_pallas(peaks: Peaks, paf8: jnp.ndarray,
                            up_h: int, up_w: int,
                            params: DecodeParams,
                            interpret: bool = False,
                            prefix_valid: bool = False) -> Candidates:
    """Gather-free candidate scoring via the Pallas sampling kernel.

    ``paf8``: the RAW stride-8 PAF map (h8, w8, 38) — valid whenever
    the decode upsample factor is integer, because integer-factor
    ``resize_area`` is exact replication (ops/resize.py:87), so
    paf_up[y, x] == paf8[y//f, x//f]. Callers must check
    :func:`can_use_pallas_sampling` first.

    ``prefix_valid=True`` asserts each part's valid peaks occupy a
    PREFIX of its K slots (true for the production top-K extraction:
    scores come out descending and valid = score > thresh) — the
    kernel then skips candidate rows whose a-endpoints are all
    invalid. Scores of invalid candidates become 0+penalty instead of
    their sampled value, which is unobservable downstream (`ok` is
    False there and greedy/assembly never read not-ok scores).

    Implemented as the B=1 slice of
    :func:`score_candidates_pallas_batch` so the plane-packing /
    tile-padding / row-skip logic exists exactly once.
    """
    out = score_candidates_pallas_batch(
        jax.tree.map(lambda a: a[None], peaks), paf8[None],
        up_h, up_w, params, interpret=interpret,
        prefix_valid=prefix_valid)
    return Candidates(score=out.score[0], ok=out.ok[0])


def score_candidates_pallas_batch(peaks_b: Peaks, paf8_b: jnp.ndarray,
                                  up_h: int, up_w: int,
                                  params: DecodeParams,
                                  interpret: bool = False,
                                  prefix_valid: bool = True
                                  ) -> Candidates:
    """Batched gather-free scoring: ONE kernel call over b*19 pair
    planes instead of a vmap-lifted grid (Mosaic rejects the row-skip
    scalar's SMEM block spec under vmap batching, and the flat grid
    also avoids the lifted batch dimension entirely — same move as the
    smooth+NMS batch flatten in ops/decode.py)."""
    from tfpose_tpu.ops.pallas.paf_score import (
        HPAD, LANES, paf_sample_scores_pallas)

    b, h8, w8, _ = paf8_b.shape
    fy, fx = up_h // h8, up_w // w8
    vx, vy, norm, safe, av, bv, flat = jax.vmap(
        lambda pk: _candidate_geometry(pk, up_h, up_w, params))(peaks_b)
    k = vx.shape[-1]
    s = params.step_paf
    iy8 = (flat // up_w) // fy                     # (B, 19, K, K, S)
    ix8 = (flat % up_w) // fx

    # per-pair x/y channel planes, zero-padded and TRANSPOSED to the
    # kernel layout (W on sublanes, H on lanes). W pads only to the
    # next sublane multiple — the kernel's row-select matmul cost
    # scales with the padded width, so a fixed 128 would waste ~2.3x
    # MXU work at thin's w8=54.
    wpad = ((w8 + 7) // 8) * 8
    pc = jnp.asarray(paf_channels_array())         # (19, 2)
    planes = jnp.transpose(paf8_b[:, :, :, pc],
                           (0, 3, 4, 2, 1))        # (B,19,2,w8,h8)
    planes = jnp.pad(planes.astype(jnp.float32),
                     ((0, 0), (0, 0), (0, 0), (0, wpad - w8),
                      (0, HPAD - h8)))
    planes_t = planes.reshape(b * 19, 2 * wpad, HPAD)

    # pad the candidate axis to full (8, 128) VMEM tiles — small K
    # (e.g. the fast preset's 16 -> K*K=256) would otherwise give
    # partial-sublane blocks that Mosaic rejects. Pad samples point at
    # (0, 0) with zero direction, so their scores/counts are exactly 0
    # and are sliced off before reshape.
    kk = k * k
    kk_pad = ((kk + 1023) // 1024) * 1024

    def sample_major(a, fill):           # (B,19,K,K,S)->(B*19,S,KKp)
        a = jnp.transpose(a, (0, 1, 4, 2, 3)).reshape(b * 19, s, kk)
        if kk_pad != kk:
            a = jnp.pad(a, ((0, 0), (0, 0), (0, kk_pad - kk)),
                        constant_values=fill)
        return a

    vxs = jnp.broadcast_to(vx[..., None], vx.shape + (s,))
    vys = jnp.broadcast_to(vy[..., None], vy.shape + (s,))
    nrows = None
    if prefix_valid:
        va = jnp.sum(av.astype(jnp.int32), axis=2)          # (B, 19)
        nrows = jnp.where(jnp.any(bv, axis=2),
                          (va * k + LANES - 1) // LANES,
                          0).reshape(b * 19)
    mean, cnt = paf_sample_scores_pallas(
        planes_t, sample_major(iy8, 0), sample_major(ix8, 0),
        sample_major(vxs, 0.0), sample_major(vys, 0.0),
        s_paf=s, thresh=float(params.thresh_vector_score),
        nrows=nrows, interpret=interpret)
    mean = mean[:, :kk].reshape(b, 19, k, k)
    cnt = cnt[:, :kk].reshape(b, 19, k, k)

    penalty = jnp.minimum(0.0, 0.5 * up_h / jnp.maximum(norm, 1e-12)
                          - 1.0)
    criterion2 = mean + penalty
    ok = ((cnt > params.thresh_vector_cnt1)
          & (criterion2 > 0.0)
          & safe
          & av[..., :, None] & bv[..., None, :])
    return Candidates(score=criterion2, ok=ok)


def can_use_pallas_sampling(h8: int, w8: int, up_h: int, up_w: int,
                            max_peaks: int = 32) -> bool:
    """Raw-grid kernel sampling is exact iff the upsample factor is a
    pure integer replication and the planes fit the kernel tile.
    Candidate counts that don't fill (8, 128) VMEM blocks (e.g. the
    fast preset's K=16 -> 256) are zero-padded to full tiles by
    :func:`score_candidates_pallas`."""
    from tfpose_tpu.ops.pallas.paf_score import HPAD, WPAD_MAX
    return (up_h % h8 == 0 and up_w % w8 == 0
            and up_h >= h8 and up_w >= w8
            and h8 <= HPAD and w8 <= WPAD_MAX)


def greedy_connections(cands: Candidates,
                       params: DecodeParams) -> Connections:
    """Greedy non-conflicting selection per pair (vmapped masked argmax).

    Equivalent to the reference's score-descending scan that skips
    candidates whose endpoint is already used: the t-th masked argmax is
    exactly the t-th accepted candidate of that scan.
    """
    k = cands.score.shape[-1]
    neg = jnp.float32(-jnp.inf)

    # Scatter/gather-free loop body: every per-iteration update is a
    # dense one-hot compare-and-where over (K,) lanes and the selected
    # score is re-derived with max() rather than flat[argmax]. The
    # previous formulation (`used_a.at[ai].set`, `flat[arg]`) lowered
    # to batched scalar scatters/gathers under the (batch x 19-pair)
    # vmap, which serialised on TPU and cost ~1.5 ms/img at b=16 —
    # 25x the whole PAF sampling kernel.
    lane_k = jnp.arange(k, dtype=jnp.int32)

    def per_pair(score_kk, ok_kk):
        # while_loop instead of a fixed K-round fori: accepted
        # connections fill slots contiguously and acceptance is
        # monotone (once no unused candidate remains it stays so), so
        # the loop stops after the last acceptance — typically
        # n_people+1 rounds, not max_peaks (under vmap: the batch/pair
        # worst case). Semantics identical to the K-round loop.
        def cond(carry):
            t, cont, _ = carry
            return cont & (t < k)

        def body(carry):
            t, _, st = carry
            used_a, used_b, a_sl, b_sl, sc, val = st
            masked = jnp.where(
                ok_kk & ~used_a[:, None] & ~used_b[None, :], score_kk, neg)
            flat = masked.reshape(-1)
            best = jnp.max(flat)
            arg = jnp.argmax(flat).astype(jnp.int32)
            ai = arg // k
            bi = arg % k
            take = best > neg
            used_a = used_a | ((lane_k == ai) & take)
            used_b = used_b | ((lane_k == bi) & take)
            slot = lane_k == t
            a_sl = jnp.where(slot, jnp.where(take, ai, -1), a_sl)
            b_sl = jnp.where(slot, jnp.where(take, bi, -1), b_sl)
            sc = jnp.where(slot, jnp.where(take, best, 0.0), sc)
            val = jnp.where(slot, take, val)
            return t + 1, take, (used_a, used_b, a_sl, b_sl, sc, val)

        init = (jnp.zeros(k, bool), jnp.zeros(k, bool),
                jnp.full(k, -1, jnp.int32), jnp.full(k, -1, jnp.int32),
                jnp.zeros(k, jnp.float32), jnp.zeros(k, bool))
        _, _, (_, _, a_sl, b_sl, sc, val) = jax.lax.while_loop(
            cond, body, (jnp.int32(0), jnp.bool_(True), init))
        return a_sl, b_sl, sc, val

    a_sl, b_sl, sc, val = jax.vmap(per_pair)(cands.score, cands.ok)
    return Connections(a_slot=a_sl, b_slot=b_sl, score=sc, valid=val)
