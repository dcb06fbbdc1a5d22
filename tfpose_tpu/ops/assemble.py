"""Limb-to-human assembly as fixed-shape, jittable label propagation.

The reference merges greedy connections into "subset" rows with a
sequential, dynamically-sized loop (``pafprocess.cpp`` step 4;
oracle twins: ``oracle/numpy_decoder.assemble``,
``oracle/cpp/pafdecode.cpp:128-180``). For the spanning-tree limb
pairs 0..16 that loop reduces to connected components: pair order
guarantees each part appears as a pair's second endpoint exactly once
before being used as a first endpoint, so every accepted tree
connection either creates a row or extends one — never hits the
overlap branch, and never writes a row slot twice. On TPU we compute
the components with static shapes:
  1. nodes = (18 parts x K slots); edges = accepted connections;
  2. min-label propagation (scatter-min, fixed iteration count >= graph
     diameter) finds connected components;
  3. segment reductions produce per-component part counts and scores;
  4. components failing the reference thresholds (part count <
     THRESH_PART_CNT, mean score < THRESH_HUMAN_SCORE) are dropped, and
     the rest are compacted into (max_humans, 18, ...) padded outputs.

The two redundant ear<->shoulder pairs (17, 18) are where the
reference loop's SEQUENTIAL, SLOT-BASED nature matters. Its row scan
matches ``row[p1]==cid1 or row[p2]==cid2`` — an ear is only "found"
while it still occupies some row's ear slot, and every attach
overwrites a slot, displacing the previous occupant for all later
connections of the same pair. The branch semantics per connection:

  * both endpoints in rows, rows occupancy-DISJOINT -> fuse the rows
    (add conn.score);
  * both endpoints in rows, rows OVERLAP (any part index occupied in
    both) -> NO fuse: the earlier-created row r1 gets
    ``r1[p2] = cid2`` (displacing r1's current ear), count += 1,
    score += peak2 + conn — the ear is shared across both rows and
    two overlapping people stay separate humans;
  * ear in no row's slot -> it fills the shoulder row's ear slot
    (displacing any current occupant, whose score stays counted),
    count += 1, score += peak2 + conn.

The last two cases are the SAME operation — a score/count bonus plus
an ear-slot assignment on a target row — differing only in the
target (earlier-created row vs the shoulder's row), and neither
changes connectivity. We therefore process each redundant pair's K
connections with a ``fori_loop`` that maintains per-component state
(labels for fuses, part-occupancy for the overlap test, ear-slot
owner for the displacement-aware "found" test, creation time = min
tree-edge processing order = the reference's row order) and
accumulates bonuses; the final ear outputs come from the slot owners,
exactly like the reference's rows.

Known residual divergence (documented, bounded by
tests/test_parity_bulk.py): under ``max_peaks`` saturation the peak
SETS themselves differ (the reference's C++ scan is unbounded), so
crowds beyond K peaks per part decode from different inputs.
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
# converge in ceil(log2(diameter)) + slack rounds.
_LABEL_ITERS = 10


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
    iota_k = jnp.arange(k, dtype=jnp.int32)

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
    n_e = e_pair.shape[0]
    # flattening is pair-major with greedy-rank slots inside, so the
    # edge index IS the reference's connection processing order
    order_e = jnp.arange(n_e, dtype=jnp.int32)
    big_order = jnp.int32(n_e + 1)

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
            lb = jnp.where(
                active,
                jnp.matmul(oh_b_f, labels.astype(jnp.float32),
                           precision=hp).astype(labels.dtype), big)
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
    labels0 = propagate(tree, iota_n, _LABEL_ITERS)
    used = members(tree)

    # ---- per-root phase state (values live at root node positions)
    oh_l0 = (labels0[:, None] == iota_n[None, :])
    oh_part_n = (node_part[:, None]
                 == jnp.arange(num_parts, dtype=jnp.int32)[None, :])
    pres = jnp.matmul(
        oh_l0.T.astype(jnp.float32),
        (used[:, None] & oh_part_n).astype(jnp.float32),
        precision=hp) > 0.5                                  # (N, P)
    er = at_a(labels0)
    creation = jnp.min(
        jnp.where(tree[:, None] & (er[:, None] == iota_n[None, :]),
                  order_e[:, None], big_order), axis=0)      # (N,)

    def init_owner(p2):
        vals = jnp.where(used & (node_part == p2), iota_n, -1)
        return jnp.max(jnp.where(oh_l0, vals[:, None], -1), axis=0)

    owner16 = init_owner(int(pairs[17, 1]))
    owner17 = init_owner(int(pairs[18, 1]))

    def extract(oh, arr):
        """arr[i] for the unique True position of one-hot ``oh``."""
        return jnp.sum(jnp.where(oh, arr, jnp.zeros((), arr.dtype)))

    def run_pair(pair_id, state):
        """Sequential reference semantics for one redundant pair: the
        fori_loop walks the pair's K greedy connections in processing
        order, maintaining slot ownership (displacement-aware "found"
        test), row occupancy (overlap test), labels (fuses) and
        creation times (earlier-row choice)."""
        base = pair_id * k
        p2 = int(pairs[pair_id, 1])
        col_p2 = (jnp.arange(num_parts, dtype=jnp.int32) == p2)
        a_p = jax.lax.slice_in_dim(a_node, base, base + k)
        b_p = jax.lax.slice_in_dim(b_node, base, base + k)
        es_p = jax.lax.slice_in_dim(e_score, base, base + k)
        ev_p = jax.lax.slice_in_dim(e_valid, base, base + k)

        def body(t, st):
            labels, pres, o_this, o_other, creation, bon_s, bon_c = st
            sel = iota_k == t
            ve = jnp.any(sel & ev_p)
            a = extract(sel, a_p)
            b = extract(sel, b_p)
            es = extract(sel, es_p)
            oh_an = iota_n == a
            oh_bn = iota_n == b
            ra = extract(oh_an, labels)
            in_a = jnp.any(oh_an & used) & ve
            ps_b = extract(oh_bn, node_score)
            match_b = o_this == b
            has_b = jnp.any(match_b) & ve
            rb = extract(match_b, iota_n)
            oh_ra = iota_n == ra
            oh_rb = (iota_n == rb) & has_b
            pres_a = jnp.any(pres & oh_ra[:, None], axis=0)
            pres_b = jnp.any(pres & oh_rb[:, None], axis=0)
            overlap = jnp.any(pres_a & pres_b)
            differ = in_a & has_b & (ra != rb)
            fuse = differ & ~overlap
            attach = differ & overlap
            extend = in_a & ~has_b
            c_a = extract(oh_ra, creation)
            c_b = extract(oh_rb, creation)
            r1 = jnp.where(c_a <= c_b, ra, rb)
            do_b = attach | extend
            tgt = jnp.where(attach, r1, ra)
            oh_t = (iota_n == tgt) & do_b
            bon_s = bon_s + jnp.where(oh_t, ps_b + es, 0.0)
            bon_c = bon_c + jnp.where(oh_t, 1.0, 0.0)
            o_this = jnp.where(oh_t, b, o_this)
            pres = pres | (oh_t[:, None] & col_p2[None, :])
            # fuse: full-component relabel to the min root; merge the
            # per-root state into it and clear the dead root
            rmin = jnp.minimum(ra, rb)
            rmax = jnp.maximum(ra, rb)
            oh_min = (iota_n == rmin) & fuse
            oh_max = (iota_n == rmax) & fuse
            both = pres_a | pres_b
            pres = jnp.where(oh_min[:, None], both[None, :], pres)
            pres = jnp.where(oh_max[:, None], False, pres)
            oh_minu = iota_n == rmin
            oh_maxu = iota_n == rmax

            def merge(arr, red, dead):
                v = red(extract(oh_minu, arr), extract(oh_maxu, arr))
                arr = jnp.where(oh_min, v, arr)
                return jnp.where(oh_max, dead, arr)

            o_this = merge(o_this, jnp.maximum, -1)
            o_other = merge(o_other, jnp.maximum, -1)
            creation = merge(creation, jnp.minimum, big_order)
            bon_s = bon_s + jnp.where(oh_min, es, 0.0)
            labels = jnp.where(fuse & (labels == rmax), rmin, labels)
            return labels, pres, o_this, o_other, creation, bon_s, bon_c

        # greedy fills valid connections contiguously from slot 0, so
        # the walk stops at the first invalid slot (typically a few
        # rounds, not K; under vmap: the batch worst case)
        def cond(carry):
            t, _ = carry
            return (t < k) & jnp.any((iota_k == t) & ev_p)

        def step(carry):
            t, st = carry
            return t + 1, body(t, st)

        return jax.lax.while_loop(
            cond, step, (jnp.int32(0), state))[1]

    bon_s = jnp.zeros(n, jnp.float32)
    bon_c = jnp.zeros(n, jnp.float32)
    st = (labels0, pres, owner16, owner17, creation, bon_s, bon_c)
    labels, pres, owner16, owner17, creation, bon_s, bon_c = run_pair(
        17, st)
    st = (labels, pres, owner17, owner16, creation, bon_s, bon_c)
    labels, pres, owner17, owner16, creation, bon_s, bon_c = run_pair(
        18, st)
    root = labels

    # per-root aggregates as matmuls over one-hot root membership
    oh_root = (root[:, None] == iota_n[None, :])          # (N, N)
    oh_root_f = oh_root.astype(jnp.float32)
    edge_root = at_a(root)                                 # (E,)
    oh_eroot = (edge_root[:, None] == iota_n[None, :])
    score_sum = jnp.matmul(jnp.where(tree, e_score, 0.0),
                           oh_eroot.astype(jnp.float32), precision=hp)
    score_sum = score_sum + jnp.matmul(
        jnp.where(used, node_score, 0.0) + bon_s, oh_root_f,
        precision=hp)
    count = jnp.matmul(used.astype(jnp.float32) + bon_c, oh_root_f,
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
    node_h = at_labels(root, human_of_root)                # (N,)
    hix = node_h.reshape(num_parts, k)
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

    # ear displays come from the slot owners, exactly like the
    # reference's rows (an attached ear displaces the member winner)
    h_iota = jnp.arange(max_h + 1, dtype=jnp.int32)
    node_xys = jnp.stack([node_x, node_y, node_score], axis=-1)  # (N,3)
    for owner, pid in ((owner16, 17), (owner17, 18)):
        p2 = int(pairs[pid, 1])
        valid_o = owner >= 0
        h_arr = jnp.where(valid_o, node_h, max_h)
        oh_hh = (h_arr[:, None] == h_iota[None, :]) & valid_o[:, None]
        oh_o = (jnp.maximum(owner, 0)[:, None] == iota_n[None, :])
        vals = jnp.matmul(oh_o.astype(jnp.float32), node_xys,
                          precision=hp)                    # (N, 3)
        ov = jnp.matmul(oh_hh.astype(jnp.float32).T, vals,
                        precision=hp)                      # (H+1, 3)
        has = oh_hh.any(axis=0)
        coords_x = coords_x.at[:, p2].set(
            jnp.where(has, ov[:, 0], coords_x[:, p2]))
        coords_y = coords_y.at[:, p2].set(
            jnp.where(has, ov[:, 1], coords_y[:, p2]))
        p_scores = p_scores.at[:, p2].set(
            jnp.where(has, ov[:, 2], p_scores[:, p2]))
        p_valid = p_valid.at[:, p2].set(has)

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
    iota_n = jnp.arange(n, dtype=jnp.int32)

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
    n_e = e_pair.shape[0]
    order_e = jnp.arange(n_e, dtype=jnp.int32)
    big_order = jnp.int32(n_e + 1)

    def propagate(active, init=None, iters=_LABEL_ITERS):
        an = jnp.where(active, a_node, 0)
        bn = jnp.where(active, b_node, 0)
        labels = (iota_n if init is None else init)
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

    tree = e_valid & (e_pair < 17)
    labels0 = propagate(tree)
    used = members(tree)

    # ---- per-root phase state (values live at root node positions);
    # see the module docstring / assemble_dense for the semantics
    pres = jnp.zeros((n, num_parts), bool)
    pres = pres.at[labels0, node_part].max(used)
    creation = jnp.full(n, big_order, jnp.int32)
    creation = creation.at[jnp.where(tree, labels0[a_node], n - 1)].min(
        jnp.where(tree, order_e, big_order))

    def init_owner(p2):
        vals = jnp.where(used & (node_part == p2), iota_n, -1)
        return jnp.full(n, -1, jnp.int32).at[labels0].max(vals)

    owner16 = init_owner(int(pairs[17, 1]))
    owner17 = init_owner(int(pairs[18, 1]))

    def run_pair(pair_id, state):
        base = pair_id * k
        p2 = int(pairs[pair_id, 1])

        def body(t, st):
            labels, pres, o_this, o_other, creation, bon_s, bon_c = st
            e = base + t
            ve = e_valid[e]
            a = a_node[e]
            b = b_node[e]
            es = e_score[e]
            ps_b = node_score[b]
            ra = labels[a]
            in_a = used[a] & ve
            match_b = o_this == b
            has_b = match_b.any() & ve
            rb = jnp.max(jnp.where(match_b, iota_n, -1))
            rb_s = jnp.maximum(rb, 0)
            overlap = (pres[ra] & pres[rb_s]).any() & has_b
            differ = in_a & has_b & (ra != rb)
            fuse = differ & ~overlap
            attach = differ & overlap
            extend = in_a & ~has_b
            r1 = jnp.where(creation[ra] <= creation[rb_s], ra, rb_s)
            do_b = attach | extend
            tgt = jnp.where(attach, r1, ra)
            bon_s = bon_s.at[tgt].add(jnp.where(do_b, ps_b + es, 0.0))
            bon_c = bon_c.at[tgt].add(do_b.astype(jnp.int32))
            o_this = jnp.where(do_b & (iota_n == tgt), b, o_this)
            pres = pres.at[tgt, p2].max(do_b)
            # fuse: relabel to the min root, merge per-root state
            rmin = jnp.minimum(ra, rb_s)
            rmax = jnp.maximum(ra, rb_s)
            oh_min = (iota_n == rmin) & fuse
            oh_max = (iota_n == rmax) & fuse
            both = pres[rmin] | pres[rmax]
            pres = jnp.where(oh_min[:, None], both[None, :], pres)
            pres = jnp.where(oh_max[:, None], False, pres)

            def merge(arr, red, dead):
                v = red(arr[rmin], arr[rmax])
                arr = jnp.where(oh_min, v, arr)
                return jnp.where(oh_max, dead, arr)

            o_this = merge(o_this, jnp.maximum, -1)
            o_other = merge(o_other, jnp.maximum, -1)
            creation = merge(creation, jnp.minimum, big_order)
            bon_s = bon_s + jnp.where(oh_min, es, 0.0)
            labels = jnp.where(fuse & (labels == rmax), rmin, labels)
            return labels, pres, o_this, o_other, creation, bon_s, bon_c

        # stop at the first invalid slot (greedy fills contiguously)
        def cond(carry):
            t, _ = carry
            return (t < k) & e_valid[base + t]

        def step(carry):
            t, st = carry
            return t + 1, body(t, st)

        return jax.lax.while_loop(
            cond, step, (jnp.int32(0), state))[1]

    bon_s = jnp.zeros(n, jnp.float32)
    bon_c = jnp.zeros(n, jnp.int32)
    st = (labels0, pres, owner16, owner17, creation, bon_s, bon_c)
    labels, pres, owner16, owner17, creation, bon_s, bon_c = run_pair(
        17, st)
    st = (labels, pres, owner17, owner16, creation, bon_s, bon_c)
    labels, pres, owner17, owner16, creation, bon_s, bon_c = run_pair(
        18, st)
    root = labels

    # ---- per-root aggregates
    edge_root = root[a_node]
    score_sum = jnp.zeros(n, jnp.float32)
    score_sum = score_sum.at[edge_root].add(
        jnp.where(tree, e_score, 0.0))
    score_sum = score_sum.at[root].add(
        jnp.where(used, node_score, 0.0) + bon_s)
    count = jnp.zeros(n, jnp.int32)
    count = count.at[root].add(used.astype(jnp.int32) + bon_c)

    is_root = used & (root == iota_n)
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
        jnp.where(is_best, iota_n, n))
    winner = is_best & (iota_n == min_id[root, node_part])

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

    # ---- ear displays from slot owners (reference row slots)
    node_h = human_of_root[root]                           # (N,)
    for owner, pid in ((owner16, 17), (owner17, 18)):
        p2 = int(pairs[pid, 1])
        valid_o = owner >= 0
        h_idx = jnp.where(valid_o, node_h, max_h)
        o_safe = jnp.maximum(owner, 0)
        # clear the member-winner write first: the slot owner is the
        # ONLY display the reference has for ear parts
        keep_h = jnp.where(keep, human_of_root, max_h)
        part_valid = part_valid.at[keep_h, p2].set(False, mode="drop")
        coords = coords.at[h_idx, p2, 0].set(node_x[o_safe], mode="drop")
        coords = coords.at[h_idx, p2, 1].set(node_y[o_safe], mode="drop")
        part_scores = part_scores.at[h_idx, p2].set(
            node_score[o_safe], mode="drop")
        part_valid = part_valid.at[h_idx, p2].set(True, mode="drop")

    human_scores = jnp.zeros(max_h, jnp.float32)
    human_scores = human_scores.at[human_of_root].set(
        jnp.where(keep, mean, 0.0), mode="drop")
    human_valid = jnp.zeros(max_h, bool)
    human_valid = human_valid.at[human_of_root].set(keep, mode="drop")

    return Assembled(coords=coords, part_scores=part_scores,
                     part_valid=part_valid, human_scores=human_scores,
                     human_valid=human_valid,
                     peak_saturated=peaks.valid.all(axis=-1))
