#!/usr/bin/env python
"""Visualization client — reference ``scripts/visualization.py``
(subscribes Persons + image, re-draws the skeleton): sends a video's
frames to a running broadcaster and writes annotated frames.

Usage: python scripts/visualization.py --video in.mp4 --port 5555 \
           --output out.mp4
"""

import argparse
import logging
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from tfpose_tpu.core.types import BodyPart, Human  # noqa: E402
from tfpose_tpu.serving import PoseClient, Persons  # noqa: E402
from tfpose_tpu.utils.draw import draw_humans  # noqa: E402

logging.basicConfig(level=logging.INFO)
logger = logging.getLogger("visualization")


def msg_to_humans(msg: Persons):
    humans = []
    for pi, person in enumerate(msg.persons):
        h = Human()
        for bp in person.body_part:
            h.body_parts[bp.part_id] = BodyPart(
                f"{pi}-{bp.part_id}", bp.part_id, bp.x, bp.y,
                bp.confidence)
        humans.append(h)
    return humans


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--video", type=str, required=True)
    parser.add_argument("--host", type=str, default="127.0.0.1")
    parser.add_argument("--port", type=int, default=5555)
    parser.add_argument("--output", type=str, default="")
    parser.add_argument("--max-frames", type=int, default=0)
    args = parser.parse_args(argv)

    import cv2

    client = PoseClient(args.host, args.port)
    cap = cv2.VideoCapture(args.video)
    writer = None
    n = 0
    while True:
        ret, frame = cap.read()
        if not ret or (args.max_frames and n >= args.max_frames):
            break
        msg = client.infer_raw(frame)
        img = draw_humans(frame, msg_to_humans(msg))
        if args.output:
            if writer is None:
                writer = cv2.VideoWriter(
                    args.output, cv2.VideoWriter_fourcc(*"mp4v"),
                    cap.get(cv2.CAP_PROP_FPS) or 25.0,
                    (img.shape[1], img.shape[0]))
            writer.write(img)
        n += 1
    logger.info("visualized %d frames", n)
    if writer:
        writer.release()
    client.close()


if __name__ == "__main__":
    main()
