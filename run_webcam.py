#!/usr/bin/env python
"""Webcam inference CLI — reference ``run_webcam.py`` (per-frame
inference + skeleton draw + FPS overlay), with the double-buffered
pipeline hiding dispatch latency."""

import argparse
import logging
import time

from tfpose_tpu.estimator import TfPoseEstimator
from tfpose_tpu.models import model_wh
from tfpose_tpu.pipeline.video import VideoPipeline

logger = logging.getLogger("TfPoseEstimatorWebCam")
logging.basicConfig(
    level=logging.INFO,
    format="[%(asctime)s] [%(name)s] [%(levelname)s] %(message)s")


def main(argv=None):
    parser = argparse.ArgumentParser(description="tfpose_tpu webcam run")
    parser.add_argument("--camera", type=int, default=0)
    parser.add_argument("--model", type=str, default="mobilenet_thin")
    parser.add_argument("--resize", type=str, default="432x368")
    parser.add_argument("--resize-out-ratio", type=float, default=4.0)
    parser.add_argument("--dtype", type=str, default="float32")
    parser.add_argument("--depth", type=int, default=2,
                        help="frames in flight (pipeline depth)")
    args = parser.parse_args(argv)

    import cv2

    w, h = model_wh(args.resize)
    if w == 0 or h == 0:
        w, h = 432, 368
    e = TfPoseEstimator(args.model, target_size=(w, h), dtype=args.dtype)

    cam = cv2.VideoCapture(args.camera)
    if not cam.isOpened():
        logger.error("cannot open camera %d", args.camera)
        return
    pipe = VideoPipeline(e, upsample_size=args.resize_out_ratio, depth=args.depth)
    fps_time = time.time()

    def frames():
        while True:
            ret, frame = cam.read()
            if not ret:
                return
            yield frame

    for frame, humans in pipe.run(frames()):
        image = TfPoseEstimator.draw_humans(frame, humans, imgcopy=False)
        now = time.time()
        cv2.putText(image, "FPS: %f" % (1.0 / max(now - fps_time, 1e-6)),
                    (10, 10), cv2.FONT_HERSHEY_SIMPLEX, 0.5,
                    (0, 255, 0), 2)
        fps_time = now
        cv2.imshow("tf-pose-estimation result", image)
        if cv2.waitKey(1) == 27:
            break
    cv2.destroyAllWindows()


if __name__ == "__main__":
    main()
