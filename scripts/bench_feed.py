#!/usr/bin/env python
"""Host input-feed curve: delivered img/s of the training data path
vs prefetch depth and dataworker count (round-3 verdict weak #6 —
"the training chip is 60% idle on this host and the feed curve is
uncharacterised").

Host-only (no JAX, no TPU): the consumer simulates the device step by
sleeping ``--step-ms`` per batch (31 ms = the chip's measured 258
img/s capability at 368x368 b=8 — BASELINE.md training table), so the
delivered rate is exactly what a trainer with that step time would
see. Separates the 1-core environment from the pipeline ceiling:

* raw = single-thread PoseDataset production rate (the per-core
  pipeline ceiling: N cores => ~N x this via N dataworkers).
* prefetch depth d = PrefetchIterator(depth=d) + simulated step.
* workers n = n dataworker PROCESSES streaming over TCP (the
  reference's pose_dataworker.py topology) + simulated step.

Usage:
  python scripts/bench_feed.py --coco-json .../person_keypoints.json \
      --img-dir .../images [--batches 30] [--step-ms 31]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def consume(it, n_batches, batch, step_s):
    """Pull n_batches, simulating a device step per batch; return
    delivered img/s (including a warmup batch excluded from timing)."""
    it = iter(it)
    next(it)  # warmup (thread spin-up, file cache)
    t0 = time.perf_counter()
    for _ in range(n_batches):
        next(it)
        if step_s:
            time.sleep(step_s)
    dt = time.perf_counter() - t0
    return n_batches * batch / dt


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--coco-json", required=True)
    p.add_argument("--img-dir", required=True)
    p.add_argument("--input-size", default="368x368")
    p.add_argument("--batchsize", type=int, default=8)
    p.add_argument("--batches", type=int, default=30)
    p.add_argument("--step-ms", type=float, default=31.0)
    p.add_argument("--depths", default="0,1,2,4,8")
    p.add_argument("--workers", default="1,2")
    args = p.parse_args(argv)

    from tfpose_tpu.train.dataset import (PoseDataset, PrefetchIterator,
                                          load_coco_annotations)

    w, h = (int(v) for v in args.input_size.split("x"))
    anns = load_coco_annotations(args.coco_json, args.img_dir)
    step_s = args.step_ms / 1e3
    out = {"input_size": [w, h], "batch": args.batchsize,
           "step_ms": args.step_ms, "curve": {}}

    def ds(seed=0):
        return PoseDataset(anns, input_size=(w, h),
                           batch_size=args.batchsize, seed=seed)

    raw = consume(ds(), args.batches, args.batchsize, 0.0)
    out["curve"]["raw_1thread"] = round(raw, 1)
    print(f"[feed] raw single-thread production: {raw:.1f} img/s",
          file=sys.stderr)

    for d in (int(v) for v in args.depths.split(",")):
        it = ds() if d == 0 else PrefetchIterator(ds(), depth=d)
        r = consume(it, args.batches, args.batchsize, step_s)
        out["curve"][f"prefetch_{d}"] = round(r, 1)
        print(f"[feed] prefetch depth {d}: {r:.1f} img/s delivered "
              f"(step {args.step_ms} ms)", file=sys.stderr)

    # dataworker processes over TCP (loopback)
    import subprocess

    for n in (int(v) for v in args.workers.split(",")):
        procs, ports = [], []
        for i in range(n):
            port = 29770 + i
            ports.append(port)
            procs.append(subprocess.Popen(
                [sys.executable,
                 os.path.join(os.path.dirname(__file__), "..",
                              "dataworker.py"),
                 "--coco-json", args.coco_json, "--img-dir", args.img_dir,
                 "--input-size", args.input_size,
                 "--batchsize", str(args.batchsize),
                 "--port", str(port), "--seed", str(100 + i)],
                stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL))
        try:
            from tfpose_tpu.train.dataworker import RemoteBatches
            deadline = time.time() + 120
            while True:
                try:
                    rb = RemoteBatches([("127.0.0.1", p) for p in ports])
                    break
                except OSError:
                    if time.time() > deadline:
                        raise
                    time.sleep(1.0)
            r = consume(rb, args.batches, args.batchsize, step_s)
            out["curve"][f"workers_{n}"] = round(r, 1)
            print(f"[feed] {n} dataworker(s): {r:.1f} img/s delivered",
                  file=sys.stderr)
        finally:
            for pr in procs:
                pr.terminate()
            for pr in procs:
                pr.wait(timeout=10)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
