#!/usr/bin/env python
"""Per-op device-trace accounting for the CMU backbone (round-3
verdict weak #3 / next-round #6).

CMU 656x368 runs at ~34.7% model-level MXU while XLA's conv emitter
reaches ~55% on the same stage shapes standalone; the gap was
attributed to "the traffic-bound VGG stem plus inter-conv dependency
bubbles" without a per-op table. This script produces that table from
the device lane of a jax.profiler trace of the compiled forward:
every device event (convolution / fusion / copy), its total time over
n invocations, and its share of the program — grouped into named
buckets (stem, stage convs, elementwise/fusion, data movement) via
the HLO metadata the trace carries.

Usage:
  python scripts/profile_cmu_ops.py --batch 8          # the prod config
  python scripts/profile_cmu_ops.py --batch 16         # bubble probe
  python scripts/profile_cmu_ops.py --model mobilenet_thin --batch 16
"""

import argparse
import json
import os
import shutil
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def collect_op_events(log_dir):
    """Device-lane events with name, total ms, count, and the 'tf_op'
    / long_name metadata when the trace carries it."""
    import glob
    import gzip

    paths = sorted(glob.glob(os.path.join(
        log_dir, "plugins/profile/*/*.trace.json.gz")),
        key=os.path.getmtime)
    if not paths:
        raise FileNotFoundError(f"no trace under {log_dir}")
    with gzip.open(paths[-1]) as f:
        tr = json.load(f)
    events = tr["traceEvents"]
    device_pids = {
        e["pid"] for e in events
        if e.get("ph") == "M" and e.get("name") == "process_name"
        and "TPU" in str(e["args"].get("name", ""))}
    ops = {}
    for e in events:
        if e.get("ph") != "X" or e["pid"] not in device_pids:
            continue
        name = e["name"]
        rec = ops.setdefault(name, {"ms": 0.0, "n": 0, "meta": ""})
        rec["ms"] += e["dur"] / 1e3
        rec["n"] += 1
        if not rec["meta"] and e.get("args"):
            rec["meta"] = str(e["args"])[:400]
    return ops


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="cmu")
    p.add_argument("--width", type=int, default=656)
    p.add_argument("--height", type=int, default=368)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--runs", type=int, default=8)
    p.add_argument("--top", type=int, default=40)
    p.add_argument("--json", action="store_true",
                   help="print the full table as JSON instead of text")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from tfpose_tpu.models import get_network
    from tfpose_tpu.utils.cache import enable_compilation_cache
    from tfpose_tpu.utils.profiling import trace

    enable_compilation_cache()
    net = get_network(args.model, dtype=jnp.bfloat16)
    h, w, b = args.height, args.width, args.batch
    variables = net.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, h, w, 3), jnp.bfloat16),
                         train=False)

    @jax.jit
    def fwd(v, x):
        return net.apply(v, x, train=False)["concat_stage7"]

    x = jnp.asarray(
        np.random.default_rng(0).random((b, h, w, 3), np.float32),
        jnp.bfloat16)
    np.asarray(fwd(variables, x))  # compile outside the trace
    log_dir = "/tmp/tfpose_cmu_ops"
    shutil.rmtree(log_dir, ignore_errors=True)
    with trace(log_dir):
        for _ in range(args.runs):
            np.asarray(fwd(variables, x))

    ops = collect_op_events(log_dir)
    # drop the enclosing program event(s); keep op-level rows
    rows = [(name, r["ms"] / args.runs, r["n"], r["meta"])
            for name, r in ops.items()
            if not name.startswith("jit_")]
    prog = [(name, r["ms"] / args.runs) for name, r in ops.items()
            if name.startswith("jit_")]
    rows.sort(key=lambda t: -t[1])
    total = sum(ms for _, ms, _, _ in rows)

    def bucket(name, meta):
        low = (name + " " + meta).lower()
        if "convolution" in low or "conv" in low:
            return "conv"
        if "copy" in low or "transpose" in low or "reshape" in low:
            return "data-movement"
        if "fusion" in low:
            return "fusion"
        if "dot" in low:
            return "matmul"
        return "other"

    buckets = {}
    for name, ms, n, meta in rows:
        bk = bucket(name, meta)
        buckets[bk] = buckets.get(bk, 0.0) + ms

    if args.json:
        print(json.dumps({
            "model": args.model, "batch": b,
            "program_ms": prog, "op_total_ms": round(total, 3),
            "buckets_ms": {k: round(v, 3) for k, v in buckets.items()},
            "ops": [{"name": nm, "ms": round(ms, 4), "count": n,
                     "meta": meta}
                    for nm, ms, n, meta in rows[:args.top]],
        }, indent=1))
        return

    print(f"== {args.model} {w}x{h} b={b}: per-invocation device time ==")
    for name, ms in prog:
        print(f"program {name}: {ms:.3f} ms")
    print(f"op-event total: {total:.3f} ms")
    print("\n-- buckets --")
    for bk, ms in sorted(buckets.items(), key=lambda kv: -kv[1]):
        print(f"{bk:15s} {ms:9.3f} ms  {ms / total * 100:5.1f}%")
    print(f"\n-- top {args.top} ops --")
    for name, ms, n, meta in rows[:args.top]:
        print(f"{ms:8.3f} ms {ms / total * 100:5.1f}%  x{n:<4d} {name}")
        if meta:
            print(f"          {meta[:240]}")


if __name__ == "__main__":
    main()
