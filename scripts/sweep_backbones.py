#!/usr/bin/env python
"""BASELINE config 5, executed as ONE on-chip artifact: "COCO val
keypoint eval sweep across all 4 backbones, bf16 batched inference on
TPU mesh" (BASELINE.md, SURVEY.md §6).

For every deployed backbone family the reference ships weights for
(``models/graph/{cmu,mobilenet_thin,mobilenet_v2_large,
mobilenet_v2_small}/graph_opt.pb`` — SURVEY §2.4), run its committed
trained checkpoint over the held-out scene set (the same seed-7
distribution the e2e gates use; real COCO val cannot exist in this
sandbox — BASELINE.md "Verification status") with bf16 batched
inference sharded over a ``jax.sharding.Mesh`` data axis, and measure
per-backbone {AP, AP50, mean_px_deviation, img/s} in one process.

Accuracy comes from ``evaluation.sweep.BatchedEvaluator`` on the mesh;
throughput is the bench harness's differential-slope scan of the same
checkpoint + bf16 + batch (tunnel-RTT-immune — see bench.py docstring).

Usage::

    python scripts/sweep_backbones.py [--scenes 50] \
        [--out etcs/sweep_r5.json]

Missing checkpoints are reported in the JSON (``skipped``), not
silently dropped — the artifact must witness the WHOLE zoo.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

# (model, eval WxH, committed checkpoint) — each family's best
# committed training artifact at its training/eval resolution.
ZOO = [
    ("mobilenet_thin", (432, 368), "models/trained/thin368_coco"),
    ("mobilenet_v2_small", (160, 160), "models/trained/v2small160_coco"),
    ("mobilenet_v2_large", (160, 160), "models/trained/v2large160_coco"),
    ("cmu", (160, 160), "models/trained/cmu160_coco"),
]


def held_out_scenes(n_scenes, w, h, batch):
    """Seed-7 held-out scene set (the e2e gates' distribution —
    eval.py eval_synthetic_e2e) as batched uint8 images + OKS GT."""
    from tfpose_tpu.core.topology import COCO17_FROM_MODEL18
    from tfpose_tpu.utils import synthetic

    rng = np.random.default_rng(7)
    imgs, gts = [], {}
    for idx in range(n_scenes):
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
    while len(imgs) % batch:  # pad the tail batch
        imgs.append(np.zeros_like(imgs[0]))
    return np.stack(imgs), gts


def sweep_one(model, wh, ckpt, n_scenes, batch, mesh):
    from tfpose_tpu.evaluation.coco_eval import (
        evaluate_oks_ap,
        humans_to_detections,
        mean_keypoint_deviation,
    )
    from tfpose_tpu.evaluation.sweep import BatchedEvaluator

    w, h = wh
    imgs, gts = held_out_scenes(n_scenes, w, h, batch)
    ev = BatchedEvaluator(model, (w, h), batch_size=batch,
                          dtype="bfloat16", mesh=mesh)
    ev.load_params(ckpt)
    t0 = time.perf_counter()
    dets = []
    with mesh:
        for i in range(0, imgs.shape[0], batch):
            for j, humans in enumerate(ev.run_batch(imgs[i:i + batch])):
                if i + j < n_scenes:
                    dets.extend(humans_to_detections(
                        humans, i + j, w, h))
    eval_wall_s = time.perf_counter() - t0
    stats = evaluate_oks_ap(gts, dets)
    stats.update(mean_keypoint_deviation(gts, dets))
    stats["eval_wall_s"] = round(eval_wall_s, 1)

    # Throughput: the bench harness's scan-slope measurement of the
    # same (checkpoint, bf16, batch) program on rendered scene images.
    import bench
    perf = bench.bench_config(model, w, h, 4.0, batch, scans=16,
                              dtype="bfloat16", n_rep=4,
                              params_path=ckpt, scene_images=True)
    stats.update({
        "images_per_sec": perf["images_per_sec"],
        "per_image_ms": perf["per_image_ms"],
        "device_p50_per_image_ms": perf.get("device_p50_per_image_ms"),
        "batch": batch,
        "resolution": f"{w}x{h}",
        "checkpoint": os.path.relpath(ckpt, ROOT),
    })
    return stats


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--scenes", type=int, default=50)
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--out", type=str,
                        default=os.path.join(ROOT, "etcs",
                                             "sweep_r5.json"))
    args = parser.parse_args(argv)

    import jax

    from tfpose_tpu.parallel.mesh import make_mesh
    from tfpose_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    devices = jax.devices()
    mesh = make_mesh(n_data=len(devices), n_spatial=1)
    doc = {
        "config": "BASELINE config 5: 4-backbone sweep, bf16 batched, "
                  "TPU mesh",
        "devices": [str(d) for d in devices],
        "mesh": dict(mesh.shape),
        "scenes": args.scenes,
        "backbones": {},
        "skipped": [],
    }
    for model, wh, ckpt_dir in ZOO:
        ckpt = os.path.join(ROOT, ckpt_dir, "params.msgpack")
        if not os.path.exists(ckpt):
            doc["skipped"].append({"model": model, "missing": ckpt_dir})
            print(f"[sweep] {model}: checkpoint MISSING ({ckpt_dir})",
                  file=sys.stderr)
            continue
        t0 = time.perf_counter()
        stats = sweep_one(model, wh, ckpt, args.scenes, args.batch,
                          mesh)
        stats["total_wall_s"] = round(time.perf_counter() - t0, 1)
        doc["backbones"][model] = stats
        print(f"[sweep] {model} @{stats['resolution']}: "
              f"AP={stats.get('AP')} AP50={stats.get('AP50')} "
              f"dev={stats.get('mean_px_deviation')}px "
              f"{stats['images_per_sec']} img/s",
              file=sys.stderr)
        with open(args.out, "w") as f:  # rolling flush per backbone
            json.dump(doc, f, indent=1)
    print(json.dumps(doc))
    return doc


if __name__ == "__main__":
    main()
