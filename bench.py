#!/usr/bin/env python
"""Benchmark harness. Prints ONE JSON line on stdout; per-config detail
goes to stderr.

Headline (BASELINE.json): images/sec/chip at MobileNet-thin 432x368
multi-person with fused decode + p50 e2e latency. The TF1-reference CPU
comparator could not be measured (empty reference mount, BASELINE.md);
the documented reconstructed baseline is ~0.20 s/image (5 img/s).

Methodology: this dev environment reaches the TPU through a tunnel
whose ``block_until_ready`` returns at dispatch and whose round-trip is
~40 ms, so naive host-side timing is meaningless in both directions.
Two independent measurements are therefore reported per config:

* **throughput slope** (``per_image_ms``): each config scans its
  workload S times over DISTINCT inputs inside ONE XLA program and
  times a forced host transfer; per-image time is the slope between two
  scan lengths (cancelling the tunnel's fixed per-call cost). b=1
  configs use S=128 so slope jitter is <2% (at S=32 the tunnel's
  per-call jitter put ±0.3 ms on b=1 slopes — round-2 verdict).
* **true device p50** (``device_p50_ms``): the median on-device
  execution time of ONE invocation of the jitted program, read from the
  device lane of a ``jax.profiler`` trace — an honest per-program
  latency, immune to tunnel RTT (utils/profiling.device_p50_ms).

Decode cost depends on peak population, so alongside the random-noise
configs (worst case) the harness benches decode on REALISTIC
activations: rendered multi-person scene tensors (utils/synthetic
render_scene — the trainer's target format) and an e2e run with the
committed trained checkpoint on rendered scene images.
"""

import json
import os
import sys
import time

import numpy as np

BASELINE_IMAGES_PER_SEC = 5.0  # reconstructed TF1 CPU reference (BASELINE.md)


def _slope_timer(many, xs, scans, batch, n_rep):
    """Differential throughput: slope between two scan lengths cancels
    the fixed per-invocation cost (tunnel adds ~35 ms RTT/call)."""
    def timed(arr):
        best = float("inf")
        for _ in range(n_rep):
            t0 = time.perf_counter()
            np.asarray(many(arr))
            best = min(best, time.perf_counter() - t0)
        return best

    t_full = timed(xs)
    if scans >= 8:
        n_small = scans // 4
        t_small = timed(xs[:n_small])
        return (t_full - t_small) / ((scans - n_small) * batch) * 1e3
    return t_full / (scans * batch) * 1e3


def bench_config(model, w, h, ratio, batch, scans, dtype="bfloat16",
                 n_rep=6, fast=False, params_path=None,
                 scene_images=False, measure_p50=True):
    # n_rep: per-image time is min-of-n_rep of the differential slope's
    # two endpoints; the tunnel's per-call jitter is one-sided, so the
    # min is the clean estimate.
    import jax
    import jax.numpy as jnp

    from tfpose_tpu.core.config import DecodeParams
    from tfpose_tpu.models import get_network
    from tfpose_tpu.ops.decode import decode_batch
    from tfpose_tpu.pipeline.preprocess import normalize
    from tfpose_tpu.utils.profiling import device_p50_ms

    net = get_network(model, dtype=jnp.bfloat16 if dtype == "bfloat16"
                      else jnp.float32)
    variables = net.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, h, w, 3), jnp.float32), train=False)
    if params_path is not None:
        from tfpose_tpu.convert.checkpoint import load_params
        variables = load_params(params_path, variables)
    params = DecodeParams.fast() if fast else DecodeParams()
    up_h, up_w = int(h / 8 * ratio), int(w / 8 * ratio)

    def body(imgs):  # (B, H, W, 3) uint8 -> scalar
        outs = net.apply(variables, normalize(imgs),
                         train=False)["concat_stage7"]
        d = decode_batch(outs, up_h, up_w, params)
        return d.human_scores.sum()

    @jax.jit
    def many(xs):
        def step(c, x):
            return c + body(x), None
        acc, _ = jax.lax.scan(step, jnp.float32(0), xs)
        return acc

    rng = np.random.default_rng(0)
    if scene_images:
        from tfpose_tpu.utils.synthetic import random_people, render_image
        frames = []
        for _ in range(min(scans, 16) * batch):
            people = random_people(rng, int(rng.integers(1, 5)), h, w)
            frames.append(render_image(people, h, w, rng=rng,
                                       joint_radius=6))
        arr = np.stack(frames).reshape(-1, batch, h, w, 3)
        reps = (scans + arr.shape[0] - 1) // arr.shape[0]
        xs = jnp.asarray(np.tile(arr, (reps, 1, 1, 1, 1))[:scans])
    else:
        xs = jnp.asarray(rng.integers(
            0, 255, (scans, batch, h, w, 3), np.uint8))
    t0 = time.perf_counter()
    np.asarray(many(xs))  # compile + first run
    compile_s = time.perf_counter() - t0

    per_image_ms = _slope_timer(many, xs, scans, batch, n_rep)
    result = {"per_image_ms": round(per_image_ms, 4),
              "images_per_sec": round(1e3 / per_image_ms, 1),
              "batch": batch, "compile_s": round(compile_s, 1)}

    if measure_p50:
        # true single-invocation on-device latency of the e2e program
        single = jax.jit(body)
        p50 = device_p50_ms(single, (xs[0],))
        result["device_p50_ms"] = round(p50, 4)
        result["device_p50_per_image_ms"] = round(p50 / batch, 4)
    return result


def bench_decode_realistic(w=432, h=368, ratio=4.0, batch=16, scans=32,
                           n_rep=6):
    """Decode-only cost on realistic multi-person activations (rendered
    scene tensors in the trainer's target format), vs the worst-case
    noise the e2e configs use. Decode cost is population-dependent;
    this is the production-representative number."""
    import jax
    import jax.numpy as jnp

    from tfpose_tpu.core.config import DecodeParams
    from tfpose_tpu.ops.decode import decode_batch
    from tfpose_tpu.utils.synthetic import render_scene

    h8, w8 = h // 8, w // 8
    up_h, up_w = int(h8 * ratio), int(w8 * ratio)
    params = DecodeParams()
    rng = np.random.default_rng(7)
    outs = []
    for _ in range(min(scans, 8) * batch):
        out, _ = render_scene(rng, int(rng.integers(1, 6)), h8, w8,
                              noise=0.02)
        outs.append(out)
    arr = np.stack(outs).reshape(-1, batch, h8, w8, 57)
    reps = (scans + arr.shape[0] - 1) // arr.shape[0]
    xs = jnp.asarray(np.tile(arr, (reps, 1, 1, 1, 1))[:scans])

    def body(out57):
        return decode_batch(out57, up_h, up_w, params).human_scores.sum()

    @jax.jit
    def many(xs):
        def step(c, x):
            return c + body(x), None
        acc, _ = jax.lax.scan(step, jnp.float32(0), xs)
        return acc

    t0 = time.perf_counter()
    np.asarray(many(xs))
    compile_s = time.perf_counter() - t0
    per_image_ms = _slope_timer(many, xs, scans, batch, n_rep)
    return {"per_image_ms": round(per_image_ms, 4),
            "images_per_sec": round(1e3 / per_image_ms, 1),
            "batch": batch, "compile_s": round(compile_s, 1)}


def main():
    from tfpose_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    results = {}

    def run(name, fn, *a, **kw):
        # One retry: the tunnel's remote-compile service occasionally
        # drops a response mid-read (INTERNAL: read body ...) or leaves
        # the next program with a bare FAILED_PRECONDITION; both clear
        # on a clean re-run (CLAUDE.md).
        for attempt in (1, 2):
            try:
                r = fn(*a, **kw)
                results[name] = r
                p50 = r.get("device_p50_per_image_ms")
                p50_txt = f"p50 {p50} ms/img, " if p50 is not None else ""
                print(f"[bench] {name}: {r['per_image_ms']} ms/img "
                      f"({r['images_per_sec']} img/s, b={r['batch']}, "
                      f"{p50_txt}compile {r['compile_s']}s)",
                      file=sys.stderr)
                return
            except Exception as e:
                print(f"[bench] {name} FAILED (attempt {attempt}): {e}",
                      file=sys.stderr)
                if attempt == 1:
                    time.sleep(20)

    # All 5 BASELINE.json configs (+ fast preset + realistic-activation
    # configs) run by default; the persistent XLA cache makes repeat
    # compiles cheap. Set TFPOSE_BENCH_QUICK=1 for just the thin
    # headline pair.
    run("thin_432x368_b1", bench_config,
        "mobilenet_thin", 432, 368, 4.0, 1, 128)
    run("thin_432x368_b16", bench_config,
        "mobilenet_thin", 432, 368, 4.0, 16, 32)

    if not os.environ.get("TFPOSE_BENCH_QUICK"):
        run("v2small_368x368_b8", bench_config,
            "mobilenet_v2_small", 368, 368, 4.0, 8, 32)
        run("thin_fast_432x368_b1", bench_config,
            "mobilenet_thin", 432, 368, 4.0, 1, 128, fast=True)
        run("v2large_432x368_b1", bench_config,
            "mobilenet_v2_large", 432, 368, 4.0, 1, 128)
        run("cmu_656x368_b1", bench_config,
            "cmu", 656, 368, 4.0, 1, 32, n_rep=4)
        # CMU saturates its MXU curve ~b=8 (etcs/architecture.md
        # roofline table); the batched config is the production one.
        run("cmu_656x368_b8", bench_config,
            "cmu", 656, 368, 4.0, 8, 16, n_rep=4)
        # realistic activations (decode is population-dependent)
        run("decode_scene_432x368_b16", bench_decode_realistic)
        ckpt = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "models/trained/thin160_synth/params.msgpack")
        if os.path.exists(ckpt):
            run("thin_scene_ckpt_432x368_b16", bench_config,
                "mobilenet_thin", 432, 368, 4.0, 16, 32,
                params_path=ckpt, scene_images=True)

    head = results.get("thin_432x368_b1")
    if head is None:
        print(json.dumps({"metric": "error", "value": 0,
                          "unit": "images/sec", "vs_baseline": 0}))
        return
    batched = results.get("thin_432x368_b16", head)
    print(json.dumps({
        "metric": "images_per_sec_per_chip_mobilenet_thin_432x368",
        "value": head["images_per_sec"],
        "unit": "images/sec",
        "vs_baseline": round(
            head["images_per_sec"] / BASELINE_IMAGES_PER_SEC, 2),
        "p50_latency_ms": head.get("device_p50_ms",
                                   head["per_image_ms"]),
        "throughput_slope_ms": head["per_image_ms"],
        "batched_images_per_sec": batched["images_per_sec"],
        "configs": results,
    }))


if __name__ == "__main__":
    main()
