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
    return evaluate_oks_ap(gts, dets)


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
    args = parser.parse_args(argv)

    if args.synthetic:
        stats = eval_synthetic(args, None)
    elif args.coco_json:
        w, h = model_wh(args.resize)
        e = TfPoseEstimator(args.model, target_size=(w or 432, h or 368),
                            dtype=args.dtype)
        stats = eval_coco(args, e)
    else:
        parser.error("need --coco-json or --synthetic N")
    print(json.dumps(stats))
    return stats


if __name__ == "__main__":
    main()
