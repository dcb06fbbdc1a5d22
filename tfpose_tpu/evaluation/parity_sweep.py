"""Bulk decode-parity sweep: jitted JAX decode vs the NumPy oracle
(vs the C++ oracle on a subsample) over randomized ADVERSARIAL scenes.

SURVEY §7 planned the oracle parity net at "thousands of random +
COCO-real inputs" because greedy/merge order-dependence bugs live in
the long tail: exact score ties, ear/shoulder cycles, peak-cap
saturation, near-threshold criterion edges. Round 2 sampled ~20
scenes; this module is the promised bulk net (round-3 verdict #4).

Recipes (cycled per scene index):
  clean            1-6 well-formed people
  noisy            plane noise up to 0.05
  dropped          parts dropped with prob up to 0.5
  crowd            7-10 overlapping people (merge-order stress)
  ties             heat quantized to 1/64 -> exact score ties
  near_heat        peaks scaled to hover at the NMS heat threshold
  near_paf         PAF magnitudes scaled to hover at criterion-1 edge
  cap_saturated    max_peaks=4 with 8 people: saturation triggers the
                   adaptive-K escalation (decode_adaptive), which is
                   then checked for FULL parity against the unbounded
                   oracle (round-3 verdict #5)

Every scene is decoded by the JAX production path and the NumPy
oracle; scenes on default params are optionally cross-checked against
the native C++ twin (which hard-codes reference thresholds). The
sweep records per-recipe divergence counts. This net is what exposed
the round-2 assembly's overlapping-row fuse and slot-displacement
divergences (fixed by the sequential slot-owner model, see
ops/assemble.py); the remaining budget in tests/test_parity_bulk.py
is a small long-tail allowance, not a tolerated class.

Run standalone:  python -m tfpose_tpu.evaluation.parity_sweep 1000
"""

from __future__ import annotations

import dataclasses
import json
from typing import Dict, List, Optional, Tuple

import numpy as np

from tfpose_tpu.core.config import DecodeParams

H8, W8 = 46, 54
UP_H, UP_W = H8 * 4, W8 * 4

DEFAULT = DecodeParams()
CAPPED = DecodeParams(max_peaks=4)


def _scene(rng: np.random.Generator, recipe: str
           ) -> Tuple[np.ndarray, DecodeParams]:
    from tfpose_tpu.utils import synthetic

    if recipe == "clean":
        net, _ = synthetic.render_scene(rng, int(rng.integers(1, 7)),
                                        H8, W8)
        return net, DEFAULT
    if recipe == "noisy":
        net, _ = synthetic.render_scene(rng, int(rng.integers(1, 5)),
                                        H8, W8,
                                        noise=float(rng.uniform(0.005,
                                                                0.05)))
        return net, DEFAULT
    if recipe == "dropped":
        net, _ = synthetic.render_scene(rng, int(rng.integers(2, 5)),
                                        H8, W8,
                                        drop_prob=float(
                                            rng.uniform(0.1, 0.5)))
        return net, DEFAULT
    if recipe == "crowd":
        net, _ = synthetic.render_scene(rng, int(rng.integers(7, 11)),
                                        H8, W8, noise=0.01)
        return net, DEFAULT
    if recipe == "ties":
        net, _ = synthetic.render_scene(rng, int(rng.integers(2, 5)),
                                        H8, W8, noise=0.02)
        # quantize -> many exactly-tied peak scores; order-dependence
        # in top-K / greedy sorting surfaces here
        net = np.round(net * 64.0) / 64.0
        return net, DEFAULT
    if recipe == "near_heat":
        net, _ = synthetic.render_scene(rng, int(rng.integers(1, 4)),
                                        H8, W8, noise=0.01)
        # scale heat so peak maxima hover just above thresh_heat
        m = net[..., :19].max()
        if m > 0:
            net = net.copy()
            net[..., :19] *= (DEFAULT.thresh_heat
                              * float(rng.uniform(1.5, 3.0)) / m)
        return net, DEFAULT
    if recipe == "near_paf":
        net, _ = synthetic.render_scene(rng, int(rng.integers(1, 4)),
                                        H8, W8, noise=0.01)
        net = net.copy()
        # criterion 1 counts PAF samples above thresh; shrink magnitude
        # so sampled dot products straddle the threshold
        net[..., 19:] *= float(rng.uniform(0.15, 0.45))
        return net, DEFAULT
    if recipe == "cap_saturated":
        net, _ = synthetic.render_scene(rng, 8, H8, W8, noise=0.01)
        return net, CAPPED
    raise ValueError(recipe)


RECIPES = ("clean", "noisy", "dropped", "crowd", "ties", "near_heat",
           "near_paf", "cap_saturated")


def _cap_peaks(peaks: np.ndarray, k: int) -> np.ndarray:
    """Keep only the top-k peaks per part plane (score order), zeroing
    the rest. The oracle implements the reference's UNCAPPED dynamic
    peak lists; the production path's ``max_peaks`` cap keeps top-K by
    score (ops/nms.py:49). The sweep caps the oracle at whatever K the
    production path EFFECTIVELY used (the escalated K when saturation
    triggered adaptive escalation — 128, which no recipe's per-part
    population reaches, i.e. unbounded in practice)."""
    out = np.zeros_like(peaks)
    for p in range(peaks.shape[2]):
        plane = peaks[:, :, p]
        ys, xs = np.nonzero(plane > 0)
        if len(ys) > k:
            # tie-break like the production top-K (smooth_nms.py
            # _topk_rounds): lowest flat index among equal scores.
            # nonzero() yields flat-ascending order; a STABLE sort on
            # -score preserves it within ties ([::-1] of an ascending
            # sort would prefer the HIGHEST index instead).
            order = np.argsort(-plane[ys, xs], kind="stable")[:k]
            ys, xs = ys[order], xs[order]
        out[ys, xs, p] = plane[ys, xs]
    return out


def _oracle_humans(net, params, up_h=UP_H, up_w=UP_W):
    from tfpose_tpu.oracle import numpy_decoder, numpy_post

    peaks, heat, paf = numpy_post.full_post(net, up_h, up_w)
    peaks = _cap_peaks(peaks, params.max_peaks)
    res = numpy_decoder.process_paf(peaks, heat, paf, params)
    humans = []
    for hi in range(res.parts.shape[0]):
        parts = {}
        for p in range(18):
            cid, x, y, s = res.parts[hi, p]
            if cid >= 0:
                parts[p] = (int(x), int(y), float(s))
        humans.append((parts, float(res.scores[hi])))
    return humans


def _jax_humans(net, params, up_h=UP_H, up_w=UP_W):
    humans, _ = _jax_humans_adaptive(
        net, dataclasses.replace(params, escalate_on_saturation=False),
        up_h, up_w)
    return humans


def _jax_humans_adaptive(net, params, up_h=UP_H, up_w=UP_W):
    """Production decode with the host-side adaptive-K dispatch
    (ops.decode.decode_adaptive). Returns (humans, escalated): when a
    scene saturates the peak cap and escalates, the caller must score
    the oracle at the ESCALATED cap — that is the program that
    actually decoded the scene."""
    from tfpose_tpu.ops.decode import decode_adaptive

    out, escalated = decode_adaptive(net, up_h, up_w, params)
    coords = np.asarray(out.coords)
    scores = np.asarray(out.part_scores)
    pvalid = np.asarray(out.part_valid)
    hscores = np.asarray(out.human_scores)
    hvalid = np.asarray(out.human_valid)
    humans = []
    for hi in range(coords.shape[0]):
        if not hvalid[hi]:
            continue
        parts = {}
        for p in range(18):
            if pvalid[hi, p]:
                parts[p] = (int(round(coords[hi, p, 0] * up_w)),
                            int(round(coords[hi, p, 1] * up_h)),
                            float(scores[hi, p]))
        humans.append((parts, float(hscores[hi])))
    return humans, escalated


def _cpp_humans(net, up_h=UP_H, up_w=UP_W):
    from tfpose_tpu.oracle import numpy_post
    from tfpose_tpu.oracle import cpp

    peaks, heat, paf = numpy_post.full_post(net, up_h, up_w)
    parts, scores = cpp.process_paf(peaks.astype(np.float32),
                                    heat.astype(np.float32),
                                    paf.astype(np.float32))
    humans = []
    for hi in range(parts.shape[0]):
        pd = {}
        for p in range(18):
            if parts[hi, p, 0] >= 0:
                pd[p] = (int(parts[hi, p, 1]), int(parts[hi, p, 2]),
                         float(parts[hi, p, 3])
                         if parts.shape[2] > 3 else 0.0)
        humans.append((pd, float(scores[hi])))
    return humans


def compare(ref_humans, out_humans, tol_px: int = 0,
            tol_score: float = 1e-3, check_scores: bool = True
            ) -> Optional[str]:
    """None if the two human sets match; otherwise a short reason."""
    if len(ref_humans) != len(out_humans):
        return (f"count {len(ref_humans)} vs {len(out_humans)}")
    remaining = list(out_humans)
    for oparts, oscore in ref_humans:
        best = None
        for ji, (jparts, _) in enumerate(remaining):
            if set(jparts) != set(oparts):
                continue
            if all(abs(jparts[p][0] - oparts[p][0]) <= tol_px
                   and abs(jparts[p][1] - oparts[p][1]) <= tol_px
                   for p in oparts):
                best = ji
                break
        if best is None:
            return f"no match for human with parts {sorted(oparts)}"
        jparts, jscore = remaining.pop(best)
        if check_scores:
            # relative+absolute: oracle accumulates in float64, the
            # device path in fp32 — large crowd components accumulate
            # ~1e-3 relative fp32 error legitimately
            if abs(jscore - oscore) >= tol_score * (1 + abs(oscore)):
                return f"human score {jscore} vs {oscore}"
            for p in oparts:
                if (abs(jparts[p][2] - oparts[p][2])
                        >= tol_score * (1 + abs(oparts[p][2]))):
                    return f"part {p} score {jparts[p][2]} vs {oparts[p][2]}"
    return None


def pair_deviation(ref_humans, out_humans) -> Tuple[float, int]:
    """(sum of |Δpx|, #keypoint pairs) between two human sets, greedy-
    matched by mean part distance over shared parts. Feeds the
    BASELINE "<1 px mean keypoint deviation" number for the decode
    path vs the NumPy oracle (round-3 verdict missing #2a): deviation
    is measured in px at decode resolution over every part both
    decoders produced."""
    remaining = list(out_humans)
    dev_sum, n = 0.0, 0
    for rparts, _ in ref_humans:
        best_d, best_i = None, -1
        for ji, (jparts, _) in enumerate(remaining):
            shared = set(rparts) & set(jparts)
            if not shared:
                continue
            d = np.mean([np.hypot(rparts[p][0] - jparts[p][0],
                                  rparts[p][1] - jparts[p][1])
                         for p in shared])
            if best_d is None or d < best_d:
                best_d, best_i = d, ji
        if best_i < 0:
            continue
        jparts, _ = remaining.pop(best_i)
        for p in set(rparts) & set(jparts):
            dev_sum += float(np.hypot(rparts[p][0] - jparts[p][0],
                                      rparts[p][1] - jparts[p][1]))
            n += 1
    return dev_sum, n


@dataclasses.dataclass
class SweepStats:
    total: int = 0
    mismatches: Dict[str, int] = dataclasses.field(default_factory=dict)
    per_recipe: Dict[str, List[int]] = dataclasses.field(
        default_factory=dict)  # recipe -> [n, n_mismatch]
    cpp_total: int = 0
    cpp_mismatch: int = 0
    examples: List[str] = dataclasses.field(default_factory=list)
    dev_px_sum: float = 0.0
    dev_px_n: int = 0

    @property
    def mismatch_total(self) -> int:
        return sum(self.mismatches.values())

    @property
    def mean_px_deviation(self) -> float:
        return (self.dev_px_sum / self.dev_px_n if self.dev_px_n
                else float("nan"))

    def as_dict(self):
        return dataclasses.asdict(self) | {
            "mismatch_total": self.mismatch_total,
            "mean_px_deviation": self.mean_px_deviation}


def run_sweep(n_scenes: int, seed0: int = 0, cpp_every: int = 0,
              progress=None) -> SweepStats:
    stats = SweepStats()
    for idx in range(n_scenes):
        recipe = RECIPES[idx % len(RECIPES)]
        rng = np.random.default_rng(seed0 + idx)
        net, params = _scene(rng, recipe)
        out, escalated = _jax_humans_adaptive(net, params)
        # when the production path escalated, the oracle must be
        # capped at the ESCALATED K (effectively unbounded: 128 >> any
        # per-part peak population these scenes produce) — this is
        # exactly the reference's unbounded-scan behavior, so the
        # cap_saturated recipe now checks full unbounded-parity
        # (round-3 verdict #5) instead of truncation-parity
        ref = _oracle_humans(net,
                             params.escalated() if escalated else params)
        reason = compare(ref, out)
        ds, dn = pair_deviation(ref, out)
        stats.dev_px_sum += ds
        stats.dev_px_n += dn
        stats.total += 1
        n, bad = stats.per_recipe.get(recipe, [0, 0])
        bad_inc = 0
        if reason is not None:
            stats.mismatches[recipe] = stats.mismatches.get(recipe, 0) + 1
            bad_inc = 1
            if len(stats.examples) < 20:
                stats.examples.append(
                    f"scene {seed0 + idx} [{recipe}]: {reason}")
        stats.per_recipe[recipe] = [n + 1, bad + bad_inc]
        if cpp_every and idx % cpp_every == 0 and params is DEFAULT:
            # C++ twin hard-codes reference thresholds -> default only.
            # Its parts carry no per-part score column -> structure+
            # coords + human score, via per-part score check disabled
            cpph = _cpp_humans(net)
            ref_nos = [(p, s) for p, s in ref]
            stats.cpp_total += 1
            r = compare(
                [({k: (v[0], v[1], 0.0) for k, v in p.items()}, s)
                 for p, s in ref_nos],
                [({k: (v[0], v[1], 0.0) for k, v in p.items()}, s)
                 for p, s in cpph],
                tol_score=1e-4)
            if r is not None:
                stats.cpp_mismatch += 1
                if len(stats.examples) < 20:
                    stats.examples.append(
                        f"scene {seed0 + idx} [cpp/{recipe}]: {r}")
        if progress and (idx + 1) % 50 == 0:
            progress(idx + 1, stats)
    return stats


def run_ckpt_sweep(n_scenes: int, params_path: str,
                   input_wh: Tuple[int, int] = (160, 160),
                   seed0: int = 0, cpp_every: int = 0,
                   progress=None) -> SweepStats:
    """Parity on REAL network activations (SURVEY §7's "COCO-real
    inputs" leg): rendered multi-person scene images are forwarded
    through mobilenet_thin with TRAINED weights (the committed
    checkpoint, produced by the real COCO data path), and the
    resulting stride-8 tensors are decoded by the production JAX path
    vs the NumPy oracle (vs the C++ twin on a subsample). Trained
    activations have structured, correlated peaks/PAFs — a different
    distribution from the synthetic-renderer recipes."""
    import jax.numpy as jnp

    from tfpose_tpu.convert.checkpoint import load_params
    from tfpose_tpu.models import get_network
    from tfpose_tpu.pipeline.preprocess import normalize
    from tfpose_tpu.utils.synthetic import random_people, render_image

    w, h = input_wh
    h8, w8 = h // 8, w // 8
    up_h, up_w = h8 * 4, w8 * 4
    import jax

    net = get_network("mobilenet_thin")
    variables = net.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, h, w, 3), jnp.float32),
                         train=False)
    variables = load_params(params_path, variables)
    fwd = jax.jit(lambda img: net.apply(
        variables, normalize(img[None]), train=False)["concat_stage7"][0])

    stats = SweepStats()
    for idx in range(n_scenes):
        rng = np.random.default_rng(seed0 + idx)
        people = random_people(rng, int(rng.integers(1, 5)), h, w)
        img = render_image(people, h, w, rng=rng, joint_radius=6)
        out = np.asarray(fwd(jnp.asarray(img)), np.float32)
        jx, escalated = _jax_humans_adaptive(out, DEFAULT, up_h, up_w)
        ref = _oracle_humans(
            out, DEFAULT.escalated() if escalated else DEFAULT,
            up_h, up_w)
        reason = compare(ref, jx)
        ds, dn = pair_deviation(ref, jx)
        stats.dev_px_sum += ds
        stats.dev_px_n += dn
        stats.total += 1
        n, bad = stats.per_recipe.get("ckpt_real", [0, 0])
        bad_inc = 0
        if reason is not None:
            stats.mismatches["ckpt_real"] = (
                stats.mismatches.get("ckpt_real", 0) + 1)
            bad_inc = 1
            if len(stats.examples) < 20:
                stats.examples.append(
                    f"scene {seed0 + idx} [ckpt_real]: {reason}")
        stats.per_recipe["ckpt_real"] = [n + 1, bad + bad_inc]
        if cpp_every and idx % cpp_every == 0:
            cpph = _cpp_humans(out, up_h, up_w)
            stats.cpp_total += 1
            r = compare(
                [({k: (v[0], v[1], 0.0) for k, v in p.items()}, s)
                 for p, s in ref],
                [({k: (v[0], v[1], 0.0) for k, v in p.items()}, s)
                 for p, s in cpph],
                tol_score=1e-4)
            if r is not None:
                stats.cpp_mismatch += 1
                if len(stats.examples) < 20:
                    stats.examples.append(
                        f"scene {seed0 + idx} [cpp/ckpt_real]: {r}")
        if progress and (idx + 1) % 20 == 0:
            progress(idx + 1, stats)
    return stats


def main(argv=None):
    import sys

    args = list(argv if argv is not None else sys.argv[1:]) or ["200"]
    if args[0] == "--ckpt":
        params_path, n = args[1], int(args[2] if len(args) > 2 else 200)
        stats = run_ckpt_sweep(
            n, params_path, cpp_every=10,
            progress=lambda i, s: print(
                f"[{i}/{n}] mismatches={s.mismatch_total} "
                f"cpp={s.cpp_mismatch}/{s.cpp_total}", file=sys.stderr))
    else:
        n = int(args[0])
        stats = run_sweep(
            n, cpp_every=10,
            progress=lambda i, s: print(
                f"[{i}/{n}] mismatches={s.mismatch_total} "
                f"cpp={s.cpp_mismatch}/{s.cpp_total} "
                f"dev={s.mean_px_deviation:.4g}px/{s.dev_px_n}",
                file=sys.stderr))
    print(json.dumps(stats.as_dict(), indent=2))


if __name__ == "__main__":
    main()
