#!/usr/bin/env python
"""Frozen-graph converter CLI: reference ``graph_opt.pb`` -> msgpack
checkpoint consumable by ``TfPoseEstimator(params_path=...)``.

The reference ships its models as TF1 frozen GraphDefs
(``models/graph/<name>/graph_opt.pb``, loaded in ``networks.py``);
this converts any of them — flat network_base naming, slim nested v2
naming, Openpose scoping, ``/read`` Identities, and folded-BatchNorm
variants all resolve (convert/graphdef.py).

    python convert.py models/graph/mobilenet_thin/graph_opt.pb \
        --model mobilenet_thin --output thin.msgpack
"""

import argparse
import logging

logging.basicConfig(level=logging.INFO)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("pb_path")
    parser.add_argument("--model", required=True,
                        help="cmu | mobilenet | mobilenet_thin | "
                             "mobilenet_v2_large | mobilenet_v2_small")
    parser.add_argument("--output", required=True,
                        help="msgpack output path")
    parser.add_argument("--input-size", type=str, default="432x368")
    args = parser.parse_args(argv)

    from tfpose_tpu.convert.graphdef import convert_pb_file
    from tfpose_tpu.models import model_wh

    w, h = model_wh(args.input_size)
    convert_pb_file(args.pb_path, args.model, args.output,
                    input_size=(w, h))
    logging.getLogger("convert").info("wrote %s", args.output)


if __name__ == "__main__":
    main()
