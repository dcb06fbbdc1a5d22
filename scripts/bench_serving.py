#!/usr/bin/env python
"""Serving throughput benchmark: PoseService under N concurrent
streaming clients, dynamic batching ON vs OFF.

Honest-methodology note (CLAUDE.md): through the dev tunnel each
device program invocation carries ~40 ms fixed RTT, so ABSOLUTE
requests/s here are tunnel-bound, not chip-bound. The signal is the
RATIO: with max_batch=N, N concurrent requests share one program
invocation (one RTT + one batched forward) instead of paying N
serialised invocations. On a production host-attached chip the fixed
cost shrinks ~40x but the batched forward's per-image advantage
(BASELINE.md: thin b=16 ~1.5x b=1) remains.

Usage: python scripts/bench_serving.py [--model mobilenet_thin]
    [--resolution 432x368] [--clients 8] [--frames 16]
    [--max-batch 8]
"""

import argparse
import json
import sys
import threading
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np  # noqa: E402


def run_load(svc_addr, clients, frames, h, w):
    """Each client streams `frames` raw frames; returns wall seconds."""
    from tfpose_tpu.serving import PoseClient

    errors = []
    barrier = threading.Barrier(clients + 1)

    def one(ci):
        rng = np.random.default_rng(ci)
        c = PoseClient(*svc_addr)
        barrier.wait()
        try:
            for _ in range(frames):
                img = rng.integers(0, 255, (h, w, 3), np.uint8)
                c.infer_raw(img)
        except Exception as exc:  # pragma: no cover
            errors.append(exc)
        finally:
            c.close()

    threads = [threading.Thread(target=one, args=(i,))
               for i in range(clients)]
    for t in threads:
        t.start()
    barrier.wait()
    t0 = time.perf_counter()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    if errors:
        raise errors[0]
    return wall


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", type=str, default="mobilenet_thin")
    parser.add_argument("--resolution", type=str, default="432x368")
    parser.add_argument("--resize-out-ratio", type=float, default=4.0)
    parser.add_argument("--clients", type=int, default=8)
    parser.add_argument("--frames", type=int, default=16)
    parser.add_argument("--max-batch", type=int, default=8)
    parser.add_argument("--max-wait-ms", type=float, default=20.0)
    args = parser.parse_args(argv)

    from tfpose_tpu.estimator import TfPoseEstimator
    from tfpose_tpu.models import model_wh
    from tfpose_tpu.serving import PoseService
    from tfpose_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    w, h = model_wh(args.resolution)
    est = TfPoseEstimator(args.model, target_size=(w, h))
    result = {"model": args.model, "resolution": f"{w}x{h}",
              "clients": args.clients, "frames_each": args.frames}

    for label, max_batch in (("unbatched", 1),
                             ("batched", args.max_batch)):
        svc = PoseService(est, port=0,
                          upsample_size=args.resize_out_ratio,
                          max_batch=max_batch,
                          max_wait_ms=args.max_wait_ms)
        addr = svc.start()
        try:
            # warmup: compile the pipeline(s) once outside the clock
            run_load(addr, min(args.clients, max_batch), 2, h, w)
            wall = run_load(addr, args.clients, args.frames, h, w)
            n = args.clients * args.frames
            result[label] = {
                "requests_per_sec": round(n / wall, 1),
                "wall_s": round(wall, 2),
                "batch_histogram":
                    dict(svc._batcher.batch_sizes)
                    if svc._batcher else {1: n},
            }
        finally:
            svc.stop()

    if "unbatched" in result and "batched" in result:
        result["speedup"] = round(
            result["batched"]["requests_per_sec"]
            / result["unbatched"]["requests_per_sec"], 2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
