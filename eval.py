#!/usr/bin/env python
"""COCO keypoint evaluation CLI — reference ``tf_pose/eval.py`` flags
(``--model --resize --resize-out-ratio --coco-dir --coco-json
--data-idx``) plus ``--synthetic N`` which evaluates on rendered
ground-truth scenes when no COCO data is present (this hermetic image
has none), exercising the full estimator -> detections -> OKS-AP path.
"""

import argparse
import json
import logging
import os
import time

import numpy as np

from tfpose_tpu.estimator import TfPoseEstimator
from tfpose_tpu.evaluation.coco_eval import (
    evaluate_oks_ap,
    evaluate_with_pycocotools,
    humans_to_detections,
    mean_keypoint_deviation,
)
from tfpose_tpu.models import model_wh

logger = logging.getLogger("tfpose_tpu.eval")
logging.basicConfig(level=logging.INFO)


def eval_coco(args, e):
    from tfpose_tpu.utils.imload import read_imgfile

    with open(args.coco_json) as f:
        coco = json.load(f)
    images = coco["images"]
    if args.data_idx > 0:
        images = images[:args.data_idx]
    gts = {}
    for ann in coco["annotations"]:
        if ann.get("num_keypoints", 0) == 0:
            continue
        gts.setdefault(ann["image_id"], []).append(
            {"keypoints": ann["keypoints"], "area": ann["area"]})
    dets = []
    t0 = time.time()
    for i, im in enumerate(images):
        path = os.path.join(args.coco_dir, im["file_name"])
        img = read_imgfile(path, None, None)
        if img is None:
            continue
        if args.multi_scale and (img.shape[0] > 1.5 * e.target_size[1]
                                 or img.shape[1] > 1.5 * e.target_size[0]):
            humans = e.inference_windowed(
                img, upsample_size=args.resize_out_ratio)
        else:
            humans = e.inference(img, resize_to_default=True,
                                 upsample_size=args.resize_out_ratio)
        dets.extend(humans_to_detections(
            humans, im["id"], im["width"], im["height"]))
        if (i + 1) % 100 == 0:
            logger.info("%d/%d images (%.2f img/s)", i + 1, len(images),
                        (i + 1) / (time.time() - t0))
    with open(args.write_json, "w") as f:
        json.dump(dets, f)
    stats = evaluate_with_pycocotools(args.coco_json, dets)
    if stats is None:
        stats = evaluate_oks_ap(gts, dets)
    stats.update(mean_keypoint_deviation(gts, dets))
    return stats


def eval_synthetic(args, e):
    """Render known scenes at network-output resolution, push them
    through the real decode path, and score with OKS AP — a hermetic
    regression gate for decode quality."""
    import jax

    from tfpose_tpu.core.config import DecodeParams
    from tfpose_tpu.core.types import PoseArrays
    from tfpose_tpu.evaluation.coco_eval import humans_to_detections
    from tfpose_tpu.ops.decode import decode_jit
    from tfpose_tpu.utils import synthetic
    from tfpose_tpu.core.topology import COCO17_FROM_MODEL18

    rng = np.random.default_rng(123)
    params = DecodeParams()
    h, w = 46, 54
    up_h, up_w = h * 4, w * 4
    img_w, img_h = up_w, up_h
    gts, dets = {}, []
    for idx in range(args.synthetic):
        n_people = int(rng.integers(1, 4))
        people = synthetic.random_people(rng, n_people, h, w,
                                         separated=True)
        heat = synthetic.render_heatmap(people, h, w)
        pafm = synthetic.render_paf(people, h, w)
        net = np.concatenate([heat, pafm], axis=2).astype(np.float32)
        out = decode_jit(net, up_h, up_w, params)
        arrays = jax.tree.map(np.asarray, out)
        humans = PoseArrays(
            coords=arrays.coords, scores=arrays.part_scores,
            part_valid=arrays.part_valid,
            human_scores=arrays.human_scores,
            human_valid=arrays.human_valid).to_humans()
        dets.extend(humans_to_detections(humans, idx, img_w, img_h))
        glist = []
        for person in people:
            kp = []
            xs, ys = [], []
            for coco_id in range(17):
                part = int(COCO17_FROM_MODEL18[coco_id])
                x, y = person[part] * 4  # to upsampled coords
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
    stats = evaluate_oks_ap(gts, dets)
    stats.update(mean_keypoint_deviation(gts, dets))
    return stats


def eval_synthetic_e2e(args):
    """End-to-end learning gate: rendered part-colour-coded IMAGES ->
    full TfPoseEstimator (backbone + fused decode) -> OKS AP vs the
    ground-truth skeletons. With ``--params`` pointing at a trained
    checkpoint this proves the training stack learns (reference L4's
    purpose, ``tf_pose/train.py``); with random init it scores ~0."""
    from tfpose_tpu.core.topology import COCO17_FROM_MODEL18
    from tfpose_tpu.utils import synthetic

    w, h = model_wh(args.resize)
    w, h = w or 96, h or 96
    e = TfPoseEstimator(args.model, target_size=(w, h),
                        dtype=args.dtype,
                        params_path=args.params or None,
                        quantize=args.quantize)
    rng = np.random.default_rng(7)
    gts, dets = {}, []
    for idx in range(args.synthetic_e2e):
        n_people = int(rng.integers(1, 3))
        people = synthetic.random_people(
            rng, n_people, h, w, separated=True,
            template=synthetic.SPREAD_TEMPLATE)
        img = synthetic.render_image(people, h, w, rng)
        humans = e.inference(img, resize_to_default=False,
                             upsample_size=args.resize_out_ratio)
        dets.extend(humans_to_detections(humans, idx, w, h))
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
    stats = evaluate_oks_ap(gts, dets)
    # BASELINE accuracy clause: mean keypoint deviation in px at the
    # network input resolution (GT and detections are both in input
    # pixels here)
    stats.update(mean_keypoint_deviation(gts, dets))
    return stats


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="tfpose_tpu COCO keypoint evaluation")
    parser.add_argument("--model", type=str, default="mobilenet_thin")
    parser.add_argument("--resize", type=str, default="432x368")
    parser.add_argument("--resize-out-ratio", type=float, default=4.0)
    parser.add_argument("--dtype", type=str, default="float32")
    parser.add_argument("--coco-dir", type=str, default="")
    parser.add_argument("--coco-json", type=str, default="")
    parser.add_argument("--data-idx", type=int, default=0,
                        help="evaluate only the first N images")
    parser.add_argument("--multi-scale", action="store_true",
                        help="sliding-window scale search for images "
                             "larger than the network input "
                             "(reference --multi-scale)")
    parser.add_argument("--write-json", type=str,
                        default="/tmp/tfpose_tpu_eval.json")
    parser.add_argument("--synthetic", type=int, default=0,
                        help="evaluate on N synthetic scenes instead of "
                             "COCO (no estimator/backbone involved)")
    parser.add_argument("--synthetic-e2e", type=int, default=0,
                        help="evaluate the FULL estimator (backbone + "
                             "decode) on N rendered scenes — the "
                             "trained-checkpoint learning gate")
    parser.add_argument("--quantize", action="store_true",
                        help="int8 PTQ backbone (calibrated on "
                             "synthetic scenes; models/quantize.py)")
    parser.add_argument("--params", type=str, default="",
                        help="msgpack params for --synthetic-e2e / "
                             "--coco-json (trained checkpoint export)")
    parser.add_argument("--assert-ap50", type=float, default=None,
                        help="exit nonzero unless AP50 >= this value "
                             "(hard regression gate)")
    args = parser.parse_args(argv)

    if args.synthetic_e2e or args.coco_json or args.coco_dir:
        # Backbone paths compile real conv HLO — on the remote dev
        # tunnel that costs minutes per shape (CMU most of all); the
        # persistent cache makes every later eval of the same shape
        # start in seconds (utils/cache.py).
        from tfpose_tpu.utils.cache import enable_compilation_cache
        enable_compilation_cache()

    if args.synthetic_e2e:
        stats = eval_synthetic_e2e(args)
    elif args.synthetic:
        stats = eval_synthetic(args, None)
    elif args.coco_json:
        w, h = model_wh(args.resize)
        e = TfPoseEstimator(args.model, target_size=(w or 432, h or 368),
                            dtype=args.dtype,
                            params_path=args.params or None,
                            quantize=args.quantize)
        stats = eval_coco(args, e)
    else:
        parser.error("need --coco-json, --synthetic N, or "
                     "--synthetic-e2e N")
    print(json.dumps(stats))
    if args.assert_ap50 is not None:
        ap50 = stats.get("AP50", stats.get("ap50", 0.0))
        if ap50 < args.assert_ap50:
            raise SystemExit(
                f"AP50 gate failed: {ap50:.3f} < {args.assert_ap50}")
    return stats


if __name__ == "__main__":
    main()
