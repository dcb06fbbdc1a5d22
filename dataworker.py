#!/usr/bin/env python
"""Worker-side data server CLI — reference ``tf_pose/pose_dataworker.py``
(tensorpack ``send_dataflow_zmq`` streaming augmented batches to the
trainer host; SURVEY.md §2.5 distributed input pipeline).

Runs the CPU-heavy part of the input pipeline (image read, augment,
rasterize) on this host and streams device-ready batches to
``train.py --remote-data <host:port>[,...]``. Multiple workers can
serve one trainer; the trainer round-robins between them.

    python dataworker.py --coco-json ann.json --img-dir imgs \
        --input-size 368x368 --batchsize 16 --port 5577
    python dataworker.py --synthetic --port 5577   # rendered scenes
"""

import argparse
import logging
import time

import numpy as np

logging.basicConfig(level=logging.INFO)
logger = logging.getLogger("tfpose_tpu.dataworker_cli")


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--coco-json", type=str, default="")
    parser.add_argument("--img-dir", type=str, default="")
    parser.add_argument("--synthetic", action="store_true")
    parser.add_argument("--input-size", type=str, default="368x368")
    parser.add_argument("--batchsize", type=int, default=16)
    parser.add_argument("--sigma", type=float, default=8.0)
    parser.add_argument("--host", type=str, default="0.0.0.0")
    parser.add_argument("--port", type=int, default=5577)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args(argv)

    from tfpose_tpu.models import model_wh
    from tfpose_tpu.train.dataworker import serve_batches

    w, h = model_wh(args.input_size)
    if args.coco_json:
        from tfpose_tpu.train.dataset import (
            PoseDataset,
            load_coco_annotations,
        )
        anns = load_coco_annotations(args.coco_json, args.img_dir)
        logger.info("%d annotated images", len(anns))
        ds = PoseDataset(anns, (w, h), args.batchsize,
                         sigma=args.sigma, seed=args.seed)

        def batches():
            while True:
                yield from ds
    else:
        import train as train_cli

        rng = np.random.default_rng(args.seed)

        def batches():
            yield from train_cli.synthetic_batches(
                args.batchsize, (w, h), rng, sigma=args.sigma)

    address, stop = serve_batches(batches(), host=args.host,
                                  port=args.port)
    logger.info("serving %dx%d b=%d batches on %s:%d",
                w, h, args.batchsize, address[0], address[1])
    try:
        while True:
            time.sleep(3600)
    except KeyboardInterrupt:
        stop()


if __name__ == "__main__":
    main()
