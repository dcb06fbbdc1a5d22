#!/usr/bin/env python
"""Training-step benchmark: true on-device step latency of the jitted
train step (forward + backward + Adam), via the device lane of a
profiler trace (the only honest single-program number through the dev
tunnel — see utils/profiling.device_p50_ms).

The reference never published training throughput (SURVEY.md §6); this
records ours per config in BASELINE.md. Host input feeding is measured
separately (this 1-core dev host is input-bound; a production host is
not) — the device step time is the chip-side capability number.

Usage: python scripts/bench_train.py [--model mobilenet_thin]
           [--input-size 368x368] [--batchsize 16] [--device-targets]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np  # noqa: E402


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", type=str, default="mobilenet_thin")
    parser.add_argument("--input-size", type=str, default="368x368")
    parser.add_argument("--batchsize", type=int, default=16)
    parser.add_argument("--device-targets", action="store_true",
                        help="bench the on-device-rasterization step "
                             "(host ships joint coords only)")
    parser.add_argument("--bf16", action="store_true",
                        help="bench the mixed-precision step (bf16 "
                             "network compute, fp32 params/opt/loss)")
    parser.add_argument("--host-feed-batches", type=int, default=8,
                        help="also time the host-side synthetic batch "
                             "generator over N batches (0 = skip)")
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from tfpose_tpu.models import get_network, model_wh
    from tfpose_tpu.train.state import (
        TrainState, make_optimizer, make_train_step)
    from tfpose_tpu.utils.cache import enable_compilation_cache
    from tfpose_tpu.utils.profiling import device_p50_ms

    enable_compilation_cache()
    w, h = model_wh(args.input_size)
    b = args.batchsize
    net = get_network(args.model,
                      dtype=jnp.bfloat16 if args.bf16 else jnp.float32)
    variables = net.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, h, w, 3), jnp.float32), train=True)
    tx = make_optimizer(1e-3)
    state = TrainState.create(variables, tx)
    train_step = make_train_step(net, tx, rasterize=args.device_targets)

    rng = np.random.default_rng(0)
    if args.device_targets:
        batch = {
            "image": rng.normal(size=(b, h, w, 3)).astype(np.float32),
            "joints": np.where(
                rng.uniform(size=(b, 8, 18, 2)) < 0.7,
                rng.uniform(0, min(h, w) / 8,
                            size=(b, 8, 18, 2)), np.nan
            ).astype(np.float32),
        }
    else:
        batch = {
            "image": rng.normal(size=(b, h, w, 3)).astype(np.float32),
            "heat": rng.uniform(size=(b, h // 8, w // 8, 19))
            .astype(np.float32),
            "paf": rng.uniform(size=(b, h // 8, w // 8, 38))
            .astype(np.float32),
        }
    batch = {k: jnp.asarray(v) for k, v in batch.items()}

    step_jit = jax.jit(train_step)
    t0 = time.perf_counter()
    out_state, metrics = step_jit(state, batch)
    jax.block_until_ready(metrics)
    compile_s = time.perf_counter() - t0

    # p50 of the device program; state is donated afresh per call so
    # every run is the same program
    p50 = device_p50_ms(lambda s, bt: step_jit(s, bt)[1]["loss"],
                        (state, batch))
    result = {
        "model": args.model, "input": f"{w}x{h}", "batch": b,
        "device_targets": bool(args.device_targets),
        "bf16": bool(args.bf16),
        "step_device_p50_ms": round(p50, 3),
        "images_per_sec_chip": round(b / p50 * 1e3, 1),
        "compile_s": round(compile_s, 1),
    }

    if args.host_feed_batches:
        import train as train_cli
        gen = (train_cli.synthetic_joint_batches(b, (w, h), rng)
               if args.device_targets
               else train_cli.synthetic_batches(b, (w, h), rng))
        next(gen)  # warm caches
        t0 = time.perf_counter()
        for _ in range(args.host_feed_batches):
            next(gen)
        host_ms = ((time.perf_counter() - t0)
                   / args.host_feed_batches * 1e3)
        result["host_feed_ms_per_batch"] = round(host_ms, 1)
        result["host_bound"] = host_ms > p50

    print(json.dumps(result))


if __name__ == "__main__":
    main()
