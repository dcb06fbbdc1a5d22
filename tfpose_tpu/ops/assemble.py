"""Limb-to-human assembly as fixed-shape, jittable label propagation.

The reference merges greedy connections into "subset" rows with a
sequential, dynamically-sized loop (``pafprocess.cpp`` step 4). The
result of that loop — for the non-degenerate inputs the greedy step
produces — is the partition of peaks into connected components of the
connection graph, with per-human score = sum of connection scores plus
the scores of the member peaks.

On TPU we compute exactly that with static shapes:
  1. nodes = (18 parts x K slots); edges = accepted connections;
  2. min-label propagation (scatter-min, fixed iteration count >= graph
     diameter) finds connected components;
  3. segment reductions produce per-component part counts and scores;
  4. components failing the reference thresholds (part count <
     THRESH_PART_CNT, mean score < THRESH_HUMAN_SCORE) are dropped, and
     the rest are compacted into (max_humans, 18, ...) padded outputs.

Because limb pairs 0..16 form a spanning tree of the 18 parts, every
accepted tree-pair connection is "applied" by the reference's merge loop
(create / extend / disjoint-merge) exactly once, so component score =
sum of applied connection scores + member peak scores and part count =
member count. Only the two redundant ear<->shoulder pairs (17, 18) can
hit the reference's skip branches; we replicate its applied-edge rule:
a pair-17/18 connection counts iff its shoulder endpoint already
belongs to a component and the two endpoints are not yet connected.

Known divergence from the reference (documented, tested): when a cycle
in the ear/shoulder pairs puts two peaks of the same part into one
component, the reference keeps the first-merged cid while we keep the
higher-scoring peak. This cannot move any keypoint by more than the
distance between two true detections of the same part and does not
occur on well-formed inputs.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from tfpose_tpu.core.config import DecodeParams
from tfpose_tpu.core.topology import NUM_PARTS, pairs_array
from tfpose_tpu.ops.nms import Peaks
from tfpose_tpu.ops.paf import Connections

# The pair tree's diameter is <= 7 hops (ankle..ear through the neck);
# with per-round path compression (labels = labels[labels]) min-labels
# converge in ceil(log2(diameter)) + slack rounds. Incremental phases
# (the two ear<->shoulder pairs) start from converged labels and only
# merge whole components, so a few seeded rounds suffice.
_LABEL_ITERS = 10
_INCR_ITERS = 5


class Assembled(NamedTuple):
    """Padded decode result (pre-normalisation, heatmap pixel coords)."""

    coords: jnp.ndarray        # (max_humans, 18, 2) float32 (x, y), -1 pad
    part_scores: jnp.ndarray   # (max_humans, 18) float32
    part_valid: jnp.ndarray    # (max_humans, 18) bool
    human_scores: jnp.ndarray  # (max_humans,) float32  (score sum / count)
    human_valid: jnp.ndarray   # (max_humans,) bool
    # (18,) bool — part hit the max_peaks cap, i.e. every top-K slot is
    # above threshold: the decode MAY have dropped real peaks of that
    # part (the reference C++ scan is unbounded; see
    # tests/test_peak_cap.py for the characterised divergence)
    peak_saturated: jnp.ndarray


def assemble_dense(peaks: Peaks, conns: Connections,
                   params: DecodeParams) -> Assembled:
    """Scatter-free assembly — identical semantics to :func:`assemble`
    but every scatter is reformulated as a dense one-hot reduce or
    matmul. Under ``vmap`` XLA serialises scatters per batch element,
    which made batched decode ~2.5x slower than single-image; the
    dense ops batch perfectly. Sizes are small and static
    (nodes = 18*K, edges = 19*K), so the dense forms are cheap."""
    num_parts = NUM_PARTS
    k = peaks.x.shape[1]
    n = num_parts * k
    pairs = pairs_array()
    max_h = params.max_humans
    iota_n = jnp.arange(n, dtype=jnp.int32)

    node_part = jnp.asarray(
        np.repeat(np.arange(num_parts, dtype=np.int32), k))
    node_x = peaks.x.reshape(n).astype(jnp.float32)
    node_y = peaks.y.reshape(n).astype(jnp.float32)
    node_score = peaks.score.reshape(n)

    a_part = jnp.asarray(np.repeat(pairs[:, 0], k))
    b_part = jnp.asarray(np.repeat(pairs[:, 1], k))
    a_node = a_part * k + jnp.maximum(conns.a_slot.reshape(-1), 0)
    b_node = b_part * k + jnp.maximum(conns.b_slot.reshape(-1), 0)
    e_score = conns.score.reshape(-1)
    e_valid = conns.valid.reshape(-1)
    e_pair = jnp.asarray(
        np.repeat(np.arange(pairs.shape[0], dtype=np.int32), k))

    # one-hot edge incidence (E, N) — static-shape, built once.
    # ALL node indexing below goes through these as fp32 matmuls
    # (exact for ints < 2^24): under the batch vmap a dynamic-index
    # gather like labels[a_node] lowers to serialised per-row gathers
    # on TPU, while batched one-hot matmuls ride the MXU.
    oh_a = (a_node[:, None] == iota_n[None, :])
    oh_b = (b_node[:, None] == iota_n[None, :])
    hp = jax.lax.Precision.HIGHEST  # fp32-exact aggregation
    oh_a_f = oh_a.astype(jnp.float32)
    oh_b_f = oh_b.astype(jnp.float32)

    def at_a(vals):
        """vals[a_node] as a matmul; vals int32/bool -> same dtype."""
        out = jnp.matmul(oh_a_f, vals.astype(jnp.float32), precision=hp)
        return out.astype(vals.dtype)

    def at_b(vals):
        out = jnp.matmul(oh_b_f, vals.astype(jnp.float32), precision=hp)
        return out.astype(vals.dtype)

    def at_labels(labels, vals):
        """vals[labels] for (N,) int labels via a one-hot contraction."""
        oh_l = (labels[:, None] == iota_n[None, :]).astype(jnp.float32)
        out = jnp.matmul(oh_l, vals.astype(jnp.float32), precision=hp)
        return out.astype(vals.dtype)

    big = jnp.int32(n)

    def propagate(active, init, iters):
        labels = init

        def relax(labels):
            la = jnp.where(active, at_a(labels), big)
            lb = jnp.where(active, at_b(labels), big)
            m = jnp.minimum(la, lb)  # (E,)
            cand_a = jnp.min(jnp.where(oh_a, m[:, None], big), axis=0)
            cand_b = jnp.min(jnp.where(oh_b, m[:, None], big), axis=0)
            labels = jnp.minimum(labels, jnp.minimum(cand_a, cand_b))
            return at_labels(labels, labels)

        for _ in range(iters):
            labels = relax(labels)
        return at_labels(labels, labels)

    def members(active):
        hit = (oh_a | oh_b) & active[:, None]
        return hit.any(axis=0)

    tree = e_valid & (e_pair < 17)
    root0 = propagate(tree, iota_n, _LABEL_ITERS)
    used0 = members(tree)
    is17 = e_valid & (e_pair == 17)
    applied17 = is17 & at_a(used0) & (at_a(root0) != at_b(root0))
    root1 = propagate(tree | applied17, root0, _INCR_ITERS)
    used1 = members(tree | applied17)
    is18 = e_valid & (e_pair == 18)
    applied18 = is18 & at_a(used1) & (at_a(root1) != at_b(root1))

    e_applied = tree | applied17 | applied18
    root = propagate(e_applied, root1, _INCR_ITERS)
    used = members(e_applied)

    # per-root aggregates as matmuls over one-hot root membership
    oh_root = (root[:, None] == iota_n[None, :])          # (N, N)
    oh_root_f = oh_root.astype(jnp.float32)
    edge_root = at_a(root)                                 # (E,)
    oh_eroot = (edge_root[:, None] == iota_n[None, :])
    score_sum = jnp.matmul(jnp.where(e_applied, e_score, 0.0),
                           oh_eroot.astype(jnp.float32), precision=hp)
    score_sum = score_sum + jnp.matmul(
        jnp.where(used, node_score, 0.0), oh_root_f, precision=hp)
    count = jnp.matmul(jnp.where(used, 1.0, 0.0), oh_root_f,
                       precision=hp)

    is_root = used & (root == iota_n)
    mean = score_sum / jnp.maximum(count, 1.0)
    keep = (is_root
            & (count >= params.thresh_part_cnt)
            & (mean >= params.thresh_human_score))

    rank = jnp.cumsum(keep.astype(jnp.int32)) - 1
    human_of_root = jnp.where(keep & (rank < max_h), rank, max_h)

    # winner per (root, part): exploit the block structure — nodes of
    # part p are the contiguous slots [p*K, (p+1)*K)
    score_blk = node_score.reshape(num_parts, k)
    used_blk = used.reshape(num_parts, k)
    # (num_parts, K, max_h+1) one-hot of each node's human index
    hix = at_labels(root, human_of_root).reshape(num_parts, k)
    oh_h = (hix[:, :, None]
            == jnp.arange(max_h + 1, dtype=jnp.int32)[None, None, :])
    contrib = jnp.where(used_blk[:, :, None] & oh_h,
                        score_blk[:, :, None], -jnp.inf)
    best = contrib.max(axis=1)                             # (P, max_h+1)
    is_best = (contrib >= best[:, None, :]) & jnp.isfinite(contrib)
    slot_ids = jnp.arange(k, dtype=jnp.int32)[None, :, None]
    min_slot = jnp.where(is_best, slot_ids, k).min(axis=1)  # (P, max_h+1)
    winner = is_best & (slot_ids == min_slot[:, None, :])   # (P,K,max_h+1)

    wf = winner.astype(jnp.float32)
    x_blk = node_x.reshape(num_parts, k)
    y_blk = node_y.reshape(num_parts, k)
    coords_x = jnp.einsum("pkh,pk->hp", wf, x_blk, precision=hp)
    coords_y = jnp.einsum("pkh,pk->hp", wf, y_blk, precision=hp)
    p_scores = jnp.einsum("pkh,pk->hp", wf, score_blk, precision=hp)
    p_valid = winner.any(axis=1).T                         # (max_h+1, P)

    coords = jnp.stack([
        jnp.where(p_valid, coords_x, -1.0),
        jnp.where(p_valid, coords_y, -1.0)], axis=-1)[:max_h]
    part_scores = jnp.where(p_valid, p_scores, 0.0)[:max_h]
    part_valid = p_valid[:max_h]

    oh_keep = (human_of_root[:, None]
               == jnp.arange(max_h, dtype=jnp.int32)[None, :])
    human_scores = jnp.matmul(jnp.where(keep, mean, 0.0),
                              oh_keep.astype(jnp.float32), precision=hp)
    human_valid = (oh_keep & keep[:, None]).any(axis=0)

    return Assembled(coords=coords, part_scores=part_scores,
                     part_valid=part_valid, human_scores=human_scores,
                     human_valid=human_valid,
                     peak_saturated=peaks.valid.all(axis=-1))


def assemble(peaks: Peaks, conns: Connections,
             params: DecodeParams) -> Assembled:
    num_parts = NUM_PARTS
    k = peaks.x.shape[1]
    n = num_parts * k
    pairs = pairs_array()  # numpy (19, 2), trace-time constant
    max_h = params.max_humans

    # ---- node tables (N,)
    node_part = jnp.asarray(
        np.repeat(np.arange(num_parts, dtype=np.int32), k))
    node_x = peaks.x.reshape(n).astype(jnp.float32)
    node_y = peaks.y.reshape(n).astype(jnp.float32)
    node_score = peaks.score.reshape(n)

    # ---- edge tables (E,) with E = 19 * K
    a_part = jnp.asarray(np.repeat(pairs[:, 0], k))  # (E,)
    b_part = jnp.asarray(np.repeat(pairs[:, 1], k))
    a_node = a_part * k + jnp.maximum(conns.a_slot.reshape(-1), 0)
    b_node = b_part * k + jnp.maximum(conns.b_slot.reshape(-1), 0)
    e_score = conns.score.reshape(-1)
    e_valid = conns.valid.reshape(-1)
    # route invalid edges to a dummy self-loop on node 0 with zero weight
    a_node = jnp.where(e_valid, a_node, 0)
    b_node = jnp.where(e_valid, b_node, 0)
    # pair id of each edge row (trace-time constant)
    e_pair = jnp.asarray(
        np.repeat(np.arange(pairs.shape[0], dtype=np.int32), k))

    def propagate(active, init=None, iters=_LABEL_ITERS):
        an = jnp.where(active, a_node, 0)
        bn = jnp.where(active, b_node, 0)
        labels = (jnp.arange(n, dtype=jnp.int32) if init is None
                  else init)
        for _ in range(iters):
            m = jnp.minimum(labels[an], labels[bn])
            labels = labels.at[an].min(m)
            labels = labels.at[bn].min(m)
            # path-compress one hop to speed convergence
            labels = labels[labels]
        return labels[labels]

    def members(active):
        used_ = jnp.zeros(n, bool)
        used_ = used_.at[jnp.where(active, a_node, n - 1)].max(active)
        used_ = used_.at[jnp.where(active, b_node, n - 1)].max(active)
        return used_

    # ---- replicate the reference's applied-edge rule for the redundant
    # ear<->shoulder pairs (17, 18); tree pairs 0..16 always apply.
    tree = e_valid & (e_pair < 17)
    root0 = propagate(tree)
    used0 = members(tree)
    is17 = e_valid & (e_pair == 17)
    applied17 = is17 & used0[a_node] & (root0[a_node] != root0[b_node])
    root1 = propagate(tree | applied17, init=root0, iters=_INCR_ITERS)
    used1 = members(tree | applied17)
    is18 = e_valid & (e_pair == 18)
    applied18 = is18 & used1[a_node] & (root1[a_node] != root1[b_node])

    e_applied = tree | applied17 | applied18
    root = propagate(e_applied, init=root1, iters=_INCR_ITERS)
    used = members(e_applied)
    e_valid = e_applied

    # ---- per-root aggregates
    edge_root = root[a_node]
    score_sum = jnp.zeros(n, jnp.float32)
    score_sum = score_sum.at[edge_root].add(
        jnp.where(e_valid, e_score, 0.0))
    score_sum = score_sum.at[root].add(jnp.where(used, node_score, 0.0))
    count = jnp.zeros(n, jnp.int32)
    count = count.at[root].add(used.astype(jnp.int32))

    is_root = used & (root == jnp.arange(n, dtype=jnp.int32))
    mean = score_sum / jnp.maximum(count, 1).astype(jnp.float32)
    keep = (is_root
            & (count >= params.thresh_part_cnt)
            & (mean >= params.thresh_human_score))

    # ---- compact roots to human indices (node-id order)
    rank = jnp.cumsum(keep.astype(jnp.int32)) - 1
    human_of_root = jnp.where(keep & (rank < max_h), rank, max_h)

    # ---- resolve duplicate (root, part) by max score, tie -> min node id
    best = jnp.full((n, num_parts), -jnp.inf, jnp.float32)
    best = best.at[root, node_part].max(
        jnp.where(used, node_score, -jnp.inf))
    is_best = used & (node_score >= best[root, node_part])
    min_id = jnp.full((n, num_parts), n, jnp.int32)
    min_id = min_id.at[root, node_part].min(
        jnp.where(is_best, jnp.arange(n, dtype=jnp.int32), n))
    winner = is_best & (jnp.arange(n, dtype=jnp.int32)
                        == min_id[root, node_part])

    # ---- scatter winners into padded output
    out_h = jnp.where(winner, human_of_root[root], max_h)
    coords = jnp.full((max_h, num_parts, 2), -1.0, jnp.float32)
    coords = coords.at[out_h, node_part, 0].set(node_x, mode="drop")
    coords = coords.at[out_h, node_part, 1].set(node_y, mode="drop")
    part_scores = jnp.zeros((max_h, num_parts), jnp.float32)
    part_scores = part_scores.at[out_h, node_part].set(
        node_score, mode="drop")
    part_valid = jnp.zeros((max_h, num_parts), bool)
    part_valid = part_valid.at[out_h, node_part].set(winner, mode="drop")

    human_scores = jnp.zeros(max_h, jnp.float32)
    human_scores = human_scores.at[human_of_root].set(
        jnp.where(keep, mean, 0.0), mode="drop")
    human_valid = jnp.zeros(max_h, bool)
    human_valid = human_valid.at[human_of_root].set(keep, mode="drop")

    return Assembled(coords=coords, part_scores=part_scores,
                     part_valid=part_valid, human_scores=human_scores,
                     human_valid=human_valid,
                     peak_saturated=peaks.valid.all(axis=-1))
