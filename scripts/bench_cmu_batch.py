#!/usr/bin/env python
"""Settle CMU e2e batch size (round-4 verdict weak #2).

Round 4's per-op device-trace probe found the CMU FORWARD at b=16
running 3.295 ms/img (+3.0% over b=8), and etcs/architecture.md
recorded "Harvest taken: b=16" — but the production e2e bench config
stayed b=8 (BENCH_r04 cmu_656x368_b8 = 284.5 img/s) and no e2e b=16
number was ever measured. Either the +3% survives decode at b=16 (then
the bench production config should take it) or it does not (then the
architecture.md line is wrong as stated). This script runs BOTH e2e
configs (full forward + fused decode, 656x368, up=4, bf16 net / fp32
decode — bench.py's exact bench_config) in one process and writes one
JSON verdict.

Usage: python scripts/bench_cmu_batch.py [--out etcs/cmu_b16_r5.json]
"""

import argparse
import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", type=str,
                        default=os.path.join(ROOT, "etcs",
                                             "cmu_b16_r5.json"))
    args = parser.parse_args(argv)

    from bench import bench_config
    from tfpose_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    doc = {"config": "cmu 656x368 up=4 e2e (forward + fused decode)",
           "question": ("does the forward-only +3.0% at b=16 survive "
                        "decode end-to-end?"),
           "runs": {}}
    for batch, scans in ((8, 16), (16, 8)):
        r = bench_config("cmu", 656, 368, 4.0, batch, scans, n_rep=4)
        doc["runs"][f"b{batch}"] = r
        print(f"[cmu] b={batch}: {r['images_per_sec']} img/s "
              f"({r['per_image_ms']} ms/img, device p50 "
              f"{r.get('device_p50_per_image_ms')})", file=sys.stderr)
    b8 = doc["runs"]["b8"]["images_per_sec"]
    b16 = doc["runs"]["b16"]["images_per_sec"]
    doc["verdict"] = ("b16 wins e2e: make it the bench production "
                      "config" if b16 > b8 else
                      "b8 wins e2e: the forward-only +3% does NOT "
                      "survive decode; architecture.md corrected")
    doc["b16_vs_b8"] = round(b16 / b8, 3)
    with open(args.out, "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps(doc))
    return doc


if __name__ == "__main__":
    main()
