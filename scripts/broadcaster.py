#!/usr/bin/env python
"""Pose broadcaster daemon — the reference ROS node
(``scripts/broadcaster_ros.py``) rebuilt on the TCP PoseService:
serves pose estimation for image frames pushed by clients.

Usage: python scripts/broadcaster.py --model mobilenet_thin --port 5555
"""

import argparse
import logging
import signal
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from tfpose_tpu.estimator import TfPoseEstimator  # noqa: E402
from tfpose_tpu.models import model_wh  # noqa: E402
from tfpose_tpu.serving import PoseService  # noqa: E402

logging.basicConfig(level=logging.INFO)
logger = logging.getLogger("broadcaster")


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", type=str, default="mobilenet_thin")
    parser.add_argument("--resolution", type=str, default="432x368")
    parser.add_argument("--resize-out-ratio", type=float, default=4.0)
    parser.add_argument("--host", type=str, default="127.0.0.1")
    parser.add_argument("--port", type=int, default=5555)
    parser.add_argument("--max-batch", type=int, default=1,
                        help=">1 coalesces concurrent requests into "
                             "one device batch (dynamic batching)")
    parser.add_argument("--max-wait-ms", type=float, default=5.0)
    args = parser.parse_args(argv)

    w, h = model_wh(args.resolution)
    e = TfPoseEstimator(args.model, target_size=(w, h))
    svc = PoseService(e, host=args.host, port=args.port,
                      upsample_size=args.resize_out_ratio,
                      max_batch=args.max_batch,
                      max_wait_ms=args.max_wait_ms)
    svc.start()
    logger.info("broadcasting pose estimation on %s:%d", *svc.address)
    signal.sigwait([signal.SIGINT, signal.SIGTERM])
    svc.stop()


if __name__ == "__main__":
    main()
