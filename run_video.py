#!/usr/bin/env python
"""Video-file inference CLI — reference ``run_video.py``. Adds
``--output`` (write annotated video) and a batched pipelined mode."""

import argparse
import logging
import time

from tfpose_tpu.estimator import TfPoseEstimator
from tfpose_tpu.models import model_wh
from tfpose_tpu.pipeline.video import VideoPipeline

logger = logging.getLogger("TfPoseEstimatorVideo")
logging.basicConfig(
    level=logging.INFO,
    format="[%(asctime)s] [%(name)s] [%(levelname)s] %(message)s")


def main(argv=None):
    parser = argparse.ArgumentParser(description="tfpose_tpu video run")
    parser.add_argument("--video", type=str, required=True)
    parser.add_argument("--model", type=str, default="mobilenet_v2_large")
    parser.add_argument("--resize", type=str, default="432x368")
    parser.add_argument("--resize-out-ratio", type=float, default=4.0)
    parser.add_argument("--dtype", type=str, default="float32")
    parser.add_argument("--output", type=str, default=None)
    parser.add_argument("--show", action="store_true",
                        help="cv2.imshow preview (needs a display)")
    parser.add_argument("--max-frames", type=int, default=0)
    parser.add_argument("--depth", type=int, default=2,
                        help="frames in flight (pipeline depth)")
    args = parser.parse_args(argv)

    import cv2

    w, h = model_wh(args.resize)
    if w == 0 or h == 0:
        w, h = 432, 368
    e = TfPoseEstimator(args.model, target_size=(w, h), dtype=args.dtype)

    cap = cv2.VideoCapture(args.video)
    if not cap.isOpened():
        logger.error("cannot open video %s", args.video)
        return
    writer = None
    pipe = VideoPipeline(e, upsample_size=args.resize_out_ratio, depth=args.depth)
    n, t0 = 0, time.time()
    for frame, humans in pipe.run(_frames(cap, args.max_frames)):
        image = TfPoseEstimator.draw_humans(frame, humans, imgcopy=False)
        if args.output:
            if writer is None:
                fourcc = cv2.VideoWriter_fourcc(*"mp4v")
                writer = cv2.VideoWriter(
                    args.output, fourcc,
                    cap.get(cv2.CAP_PROP_FPS) or 25.0,
                    (image.shape[1], image.shape[0]))
            writer.write(image)
        if args.show:
            cv2.imshow("tfpose_tpu video", image)
            if cv2.waitKey(1) == 27:
                break
        n += 1
    dt = time.time() - t0
    logger.info("processed %d frames in %.2fs (%.1f FPS)", n, dt,
                n / max(dt, 1e-6))
    if writer is not None:
        writer.release()
    cap.release()


def _frames(cap, max_frames):
    n = 0
    while True:
        ret, frame = cap.read()
        if not ret or (max_frames and n >= max_frames):
            return
        n += 1
        yield frame


if __name__ == "__main__":
    main()
