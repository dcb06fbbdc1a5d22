#!/usr/bin/env python
"""Single-image inference CLI — reference ``run.py`` flags:
``--image --model --resize --resize-out-ratio`` plus ``--output`` to
save the rendered panel headlessly."""

import argparse
import logging
import sys
import time

import numpy as np

from tfpose_tpu.estimator import TfPoseEstimator
from tfpose_tpu.models import model_wh
from tfpose_tpu.utils.imload import read_imgfile

logger = logging.getLogger("TfPoseEstimatorRun")
logging.basicConfig(
    level=logging.INFO,
    format="[%(asctime)s] [%(name)s] [%(levelname)s] %(message)s")


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="tfpose_tpu single-image run")
    parser.add_argument("--image", type=str, required=True)
    parser.add_argument("--model", type=str, default="mobilenet_thin",
                        help="cmu / mobilenet / mobilenet_thin / "
                             "mobilenet_v2_large / mobilenet_v2_small")
    parser.add_argument("--resize", type=str, default="432x368",
                        help="network input resolution, e.g. 432x368")
    parser.add_argument("--resize-out-ratio", type=float, default=4.0,
                        help="upsample ratio before decoding")
    parser.add_argument("--dtype", type=str, default="float32",
                        choices=("float32", "bfloat16"))
    parser.add_argument("--output", type=str, default=None,
                        help="write the annotated image / panel here")
    args = parser.parse_args(argv)

    w, h = model_wh(args.resize)
    if w == 0 or h == 0:
        w, h = 432, 368
    e = TfPoseEstimator(args.model, target_size=(w, h), dtype=args.dtype)

    image = read_imgfile(args.image, None, None)
    if image is None:
        logger.error("Image can not be read, path=%s", args.image)
        sys.exit(-1)

    t = time.time()
    humans = e.inference(image, resize_to_default=True,
                         upsample_size=args.resize_out_ratio)
    elapsed = time.time() - t
    logger.info("inference image: %s in %.4f seconds.", args.image, elapsed)
    logger.info("%d humans detected", len(humans))
    for i, hum in enumerate(humans):
        logger.info("human %d: score=%.3f parts=%d", i, hum.score,
                    hum.part_count())

    image = TfPoseEstimator.draw_humans(image, humans, imgcopy=False)
    if args.output:
        try:
            import matplotlib
            matplotlib.use("Agg")
            import matplotlib.pyplot as plt

            fig = plt.figure(figsize=(12, 8))
            a = fig.add_subplot(2, 2, 1)
            a.set_title("Result")
            plt.imshow(image[:, :, ::-1])
            bgimg = image[:, :, ::-1].astype(np.float32) / 255.0
            heat = e.heatMat[:, :, :18].max(axis=2)
            a = fig.add_subplot(2, 2, 2)
            a.set_title("Heatmap amax")
            plt.imshow(heat, cmap="hot")
            plt.colorbar()
            a = fig.add_subplot(2, 2, 3)
            a.set_title("PAF-x")
            plt.imshow(e.pafMat[:, :, 0::2].max(axis=2), cmap="seismic")
            plt.colorbar()
            a = fig.add_subplot(2, 2, 4)
            a.set_title("PAF-y")
            plt.imshow(e.pafMat[:, :, 1::2].max(axis=2), cmap="seismic")
            plt.colorbar()
            fig.savefig(args.output)
            logger.info("panel written to %s", args.output)
        except ImportError:
            import cv2
            cv2.imwrite(args.output, image)
            logger.info("annotated image written to %s", args.output)
    return humans


if __name__ == "__main__":
    main()
